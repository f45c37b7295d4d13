"""Synthetic ESIM-layout dataset generation (for tests and benchmarks).

Writes the same on-disk layout the ESIM preprocessor produces
(reference: scripts/preprocess_esim.py:439-456): raw_events.npz,
camera_calibration.npz, camera_poses.npz, renderer_params.npz and a
views/transforms_*.json + image folder.

Two event generators:
  - `simulate_events=True` (default): an ideal event-camera simulation —
    per-pixel log-intensity threshold crossings of the analytic scene
    under the orbiting camera, with linearly interpolated crossing
    timestamps (ESIM's core algorithm). Training on these events
    reconstructs the actual scene, so PSNR/SSIM convergence is meaningful.
  - `simulate_events=False`: random events with plausible statistics, for
    pure-throughput benchmarking with a fixed workload.
"""

import json
import os

import cv2
import numpy as np


def orbit_poses(n, radius=3.0, height=0.8, t_end_ns=2_000_000_000,
                orbits=1):
    ts = np.linspace(0, t_end_ns * orbits, n).astype(np.int64)
    angle = np.linspace(0, 2 * np.pi * orbits, n)
    pos = np.stack(
        [radius * np.cos(angle), radius * np.sin(angle),
         np.full(n, height)], axis=1
    ).astype(np.float32)
    # camera looks at the origin: build rotation with z-axis toward origin
    z = -pos / np.linalg.norm(pos, axis=1, keepdims=True)
    up = np.array([0, 0, -1.0], dtype=np.float32)
    x = np.cross(z, np.broadcast_to(up, z.shape))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    y = np.cross(z, x)
    R = np.stack([x, y, z], axis=-1)  # columns = camera axes in world
    # convert to XYZW quaternions
    from scipy.spatial.transform import Rotation
    quat = Rotation.from_matrix(R).as_quat().astype(np.float32)
    return pos, quat, R, ts


# diagnostics of the last full-circuit filtering (blur-hardness readout:
# per-pixel |filtered - sharp| log-intensity deviation, in the same units
# as the contrast threshold)
LAST_BLUR_STATS = {}


def filter_log_frames_full(log_frames, frame_ts_ns, calib):
    """Filter per-pixel log intensity through the FULL 4th-order pixel
    circuit — the generator-side twin of the deblurring model.

    Uses the framework's own linearization + FOH discretization
    (models/pixel_bandwidth.py `linearize_sys`, ops/control.py
    `foh_cont2discrete`) in a per-frame `lax.scan`: each frame interval
    linearizes the NLTI photoreceptor at the interval-endpoint intensity
    (exactly the model's convention, models/pixel_bandwidth.py
    `_weight_remat`) and propagates the 4-dim state exactly under a
    linearly interpolated input. Event streams simulated through this
    filter are therefore IN the deblurring model's class, making the
    blur-on vs blur-off comparison well-posed (the reference validates
    against ESIM simulations of the same circuit, reference:
    scripts/preprocess_esim.py flags / models/pixel_bandwidth.py:8-53).

    Args:
        log_frames: (T, P) float32 per-pixel log intensity.
        frame_ts_ns: (T,) int64 strictly increasing timestamps.
        calib: camera_calibration dict with the pixel-circuit constants.
    Returns:
        (T, P) float32 filtered log intensity (diff-amp output).
    """
    import jax
    import jax.numpy as jnp

    from ..models import pixel_bandwidth
    from ..ops import control

    params, consts = pixel_bandwidth.init_pixel_bandwidth(
        calib, min_ts=0, f_c_dominant_min=1.0,
        target_cumprob_max_sample_lifetime=0.5,
    )
    lf = jnp.asarray(log_frames, jnp.float32)
    dts_s = (np.diff(np.asarray(frame_ts_ns, np.int64))
             .astype(np.float64) * 1e-9).astype(np.float32)
    # init at the DC steady state of the first frame: v=0, p=s=d=log I_0
    x0 = jnp.stack(
        [jnp.zeros_like(lf[0]), lf[0], lf[0], lf[0]], axis=-1
    )  # (P, 4)

    def frame_step(x, inp):
        u0, u1, dt = inp
        sys = pixel_bandwidth.linearize_sys(params, consts, jnp.exp(u1))
        sysd = control.foh_cont2discrete(
            sys, dt, is_state_preserved=True, is_efficient=True,
        )
        x1 = (
            sysd.A @ x[..., None]
            + sysd.B * u0[..., None, None]
            + sysd.B_tilde * u1[..., None, None]
        )[..., 0]
        return x1, x1[..., 3]

    def run():
        _, ys = jax.lax.scan(frame_step, x0, (lf[:-1], lf[1:],
                                              jnp.asarray(dts_s)))
        return ys

    try:  # keep generation off an attached accelerator
        with jax.default_device(jax.devices("cpu")[0]):
            ys = run()
    except RuntimeError:
        ys = run()
    return np.concatenate(
        [np.asarray(log_frames[:1]), np.asarray(ys)], axis=0
    )


def simulate_event_stream(analytic_image_fn, R, pos_w, pose_ts, H, W,
                          contrast_threshold, log_eps=1e-3,
                          num_frames=None, bandwidth_tau_ns=None,
                          pixel_filter=None, calib=None):
    """Ideal event-camera simulation against the analytic scene.

    Renders the scene along the (slerped-as-sampled) pose timeline and
    emits per-pixel log-intensity threshold crossings with linearly
    interpolated timestamps (the ESIM event-generation core).

    Motion-blur options (the per-pixel log intensity is low-pass
    filtered before threshold crossing, producing MOTION-BLURRED event
    streams the deblurring model can invert):
      - `bandwidth_tau_ns`: 1st-order IIR with the given time constant
        (a simplified stand-in, kept for backward compatibility);
      - `pixel_filter='full'`: the reference's full 4th-order pixel
        circuit (reference: models/pixel_bandwidth.py:8-53), using the
        constants in `calib` — see `filter_log_frames_full`.
    Returns (positions (N,2) u16, timestamps (N,) i64 sorted, polarities).
    """
    num_frames = num_frames or len(pose_ts)
    frame_idx = np.linspace(0, len(pose_ts) - 1, num_frames)
    positions, timestamps, polarities = [], [], []
    ys, xs = np.mgrid[0:H, 0:W]
    flat_x = xs.reshape(-1).astype(np.uint16)
    flat_y = ys.reshape(-1).astype(np.uint16)

    # render the (deduplicated, strictly time-increasing) frame timeline
    used = [int(frame_idx[0])]
    for fi in frame_idx[1:]:
        i = int(round(fi))
        if float(pose_ts[i]) > float(pose_ts[used[-1]]):
            used.append(i)
    frames = np.stack([
        np.log(
            analytic_image_fn(R[i], pos_w[i]) + log_eps
        ).reshape(-1)
        for i in used
    ]).astype(np.float32)  # (T, P)
    frame_ts = np.asarray([pose_ts[i] for i in used], np.int64)

    if pixel_filter == "full":
        assert calib is not None, "pixel_filter='full' needs calib"
        sharp = frames
        frames = filter_log_frames_full(frames, frame_ts, calib)
        dev = np.abs(frames - sharp)
        LAST_BLUR_STATS.clear()
        LAST_BLUR_STATS.update(
            mean_abs_log_dev=float(dev.mean()),
            p95_abs_log_dev=float(np.percentile(dev, 95)),
            max_abs_log_dev=float(dev.max()),
        )
    elif pixel_filter not in (None, "none", "first_order"):
        raise ValueError(f"unknown pixel_filter {pixel_filter!r}")
    elif bandwidth_tau_ns is not None:
        filt = frames[0].copy()
        for t in range(1, len(frames)):
            alpha = 1.0 - np.exp(
                -float(frame_ts[t] - frame_ts[t - 1])
                / float(bandwidth_tau_ns)
            )
            filt = filt + alpha * (frames[t] - filt)
            frames[t] = filt

    ref_log = frames[0].copy()
    prev_log = frames[0].copy()
    prev_ts = float(frame_ts[0])
    C = contrast_threshold

    for t in range(1, len(frames)):
        cur_log = frames[t]
        cur_ts = float(frame_ts[t])
        # number of threshold crossings since the reference level
        delta = cur_log - ref_log
        n_events = np.floor(np.abs(delta) / C).astype(np.int64)
        max_n = int(n_events.max()) if len(n_events) else 0
        for k in range(1, max_n + 1):
            fire = n_events >= k
            if not np.any(fire):
                break
            pol = delta[fire] > 0
            # linear-interp crossing time within [prev_ts, cur_ts]
            level = ref_log[fire] + np.where(pol, k * C, -k * C)
            slope = cur_log[fire] - prev_log[fire]
            frac = np.where(
                np.abs(slope) > 1e-12,
                np.clip((level - prev_log[fire]) / np.where(
                    np.abs(slope) > 1e-12, slope, 1.0), 0.0, 1.0),
                0.5,
            )
            ts = (prev_ts + frac * (cur_ts - prev_ts)).astype(np.int64)
            positions.append(
                np.stack([flat_x[fire], flat_y[fire]], axis=1)
            )
            timestamps.append(ts)
            polarities.append(pol)
        ref_log = ref_log + np.sign(delta) * n_events * C
        prev_log = cur_log
        prev_ts = cur_ts

    if not positions:
        return (np.zeros((0, 2), np.uint16), np.zeros(0, np.int64),
                np.zeros(0, bool))
    positions = np.concatenate(positions)
    timestamps = np.concatenate(timestamps)
    polarities = np.concatenate(polarities)
    order = np.argsort(timestamps, kind="stable")
    return positions[order], timestamps[order], polarities[order]


def make_dataset(root, img_height=64, img_width=64, num_events=200_000,
                 num_poses=61, bayer=False, seed=0,
                 contrast_threshold=0.25, refractory_ns=100,
                 num_views=4, simulate_events=True, num_frames=None,
                 orbits=1, bandwidth_tau_ns=None, pixel_filter=None,
                 bandwidth_scale=1.0):
    """`bandwidth_scale`: scales EVERY pixel-circuit time constant (and
    inversely every cutoff frequency) by the factor — a physical sensor
    with uniformly slower pixels. The scaled constants are both written
    into camera_calibration.npz (so the deblurring model calibrates to
    the generator, like the reference calibrates to the real sensor's
    biases, reference: scripts/eds_to_esim.py:59-79) and used by the
    `pixel_filter='full'` generator."""
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(seed)
    H, W = img_height, img_width

    pos_w, quat, R, pose_ts = orbit_poses(num_poses, orbits=orbits)
    np.savez(
        os.path.join(root, "camera_poses.npz"),
        T_wc_position=pos_w, T_wc_orientation=quat,
        T_wc_timestamp=pose_ts,
    )

    focal = 0.8 * W
    K = np.array(
        [[focal, 0, W / 2 - 0.5], [0, focal, H / 2 - 0.5], [0, 0, 1]]
    )
    s = float(bandwidth_scale)
    calib = dict(
        img_height=H, img_width=W, intrinsics=K,
        distortion_model="plumb_bob", distortion_params=np.zeros(0),
        bayer_pattern="RGGB" if bayer else "",
        pos_contrast_threshold=np.asarray(contrast_threshold),
        neg_contrast_threshold=np.asarray(contrast_threshold),
        refractory_period=np.asarray(float(refractory_ns)),
        # pixel-bandwidth circuit constants (EDS-like magnitudes,
        # reference: scripts/eds_to_esim.py:59-79)
        input_time_const_eff_it_prod=np.asarray(1e-4 * s),
        miller_time_const_eff_it_prod=np.asarray(2e-5 * s),
        amplifier_gain=np.asarray(50.0),
        closed_loop_gain=np.asarray(10.0),
        output_time_const=np.asarray(1e-4 * s),
        sf_cutoff_freq=np.asarray(500.0 / s),
        diff_amp_cutoff_freq=np.asarray(200.0 / s),
    )
    np.savez(os.path.join(root, "camera_calibration.npz"), **calib)
    np.savez(
        os.path.join(root, "renderer_params.npz"),
        interm_color_space="linear", log_eps=np.asarray(1e-3),
    )

    def analytic_image(R_wc, p_wc):
        """Ray-traced textured unit sphere at the origin: a genuine 3D
        scene (view-independent radiance), so NeRF reconstruction from
        the simulated events is well-posed."""
        ys, xs = np.mgrid[0:H, 0:W]
        pix = np.stack([xs, ys, np.ones_like(xs)], axis=-1).astype(
            np.float64
        )
        d = (np.linalg.inv(K) @ pix[..., None])[..., 0]
        d = (R_wc @ d[..., None])[..., 0]
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        o = p_wc.astype(np.float64)
        b = d @ o
        c = float(o @ o) - 1.0
        disc = b * b - c
        hit = disc > 0
        t = -b - np.sqrt(np.maximum(disc, 0.0))
        hit &= t > 0
        p = o[None, None, :] + d * t[..., None]
        tex = (
            0.55
            + 0.15 * np.sin(6.0 * p[..., 0]) * np.sin(6.0 * p[..., 1])
            + 0.12 * np.sin(4.0 * p[..., 2])
            # higher-frequency detail at SUPRA-threshold contrast:
            # denser event streams and a meaningful fine-level target
            + 0.10 * np.sin(14.0 * p[..., 0] + 7.0 * p[..., 2])
            * np.sin(11.0 * p[..., 1])
            + 0.06 * np.sin(23.0 * p[..., 0]) * np.sin(19.0 * p[..., 2])
        )
        img = np.where(hit, tex, 0.15)
        return img.astype(np.float32)

    if simulate_events:
        positions, timestamps, polarities = simulate_event_stream(
            analytic_image, R, pos_w, pose_ts, H, W,
            contrast_threshold, num_frames=num_frames or num_poses,
            bandwidth_tau_ns=bandwidth_tau_ns,
            pixel_filter=pixel_filter, calib=calib,
        )
    else:
        # random events with plausible statistics (fixed bench workload)
        positions = np.stack(
            [rng.integers(0, W, num_events),
             rng.integers(0, H, num_events)], axis=1
        ).astype(np.uint16)
        timestamps = np.sort(
            rng.integers(0, pose_ts[-1], num_events)
        ).astype(np.int64)
        polarities = rng.integers(0, 2, num_events).astype(bool)
    np.savez(
        os.path.join(root, "raw_events.npz"),
        position=positions, timestamp=timestamps, polarity=polarities,
    )

    # posed views: analytic-intensity renders at a few orbit poses
    views_dir = os.path.join(root, "views")
    os.makedirs(views_dir, exist_ok=True)

    # train views at early orbit poses; val/test views at DIFFERENT orbit
    # positions so novel_view evaluation is genuinely novel
    n_eval = min(2, num_poses)
    val_idx = [int(i) for i in np.linspace(
        num_poses // 8, 3 * num_poses // 8, n_eval
    )]
    test_idx = [int(i) for i in np.linspace(
        5 * num_poses // 8, 7 * num_poses // 8, n_eval
    )]
    for stage, indices in (
        ("train", range(0, min(num_views, num_poses))),
        ("val", val_idx),
        ("test", test_idx),
    ):
        frames = []
        for i in indices:
            name = f"{stage}_{i:03d}"
            img = analytic_image(R[i], pos_w[i])
            cv2.imwrite(
                os.path.join(views_dir, name + ".exr"), img
            ) if False else None
            # float TIFF keeps the linear color space without EXR deps
            cv2.imwrite(os.path.join(views_dir, name + ".tiff"), img)
            T = np.eye(4)
            # stored pose is OpenGL convention; our loader right-multiplies
            # by diag(1,-1,-1), so pre-invert that here
            T[:3, :3] = R[i] @ np.diag([1.0, -1.0, -1.0])
            T[:3, 3] = pos_w[i]
            frames.append(
                {"file_path": name, "transform_matrix": T.tolist()}
            )
        with open(
            os.path.join(views_dir, f"transforms_{stage}.json"), "w"
        ) as f:
            json.dump(
                {
                    "camera_angle_x": float(
                        2 * np.arctan((W / 2) / focal)
                    ),
                    "frames": frames,
                },
                f,
            )
    return root
