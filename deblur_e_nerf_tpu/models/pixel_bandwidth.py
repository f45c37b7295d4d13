"""Pixel-bandwidth (motion-blur) model: 4th-order NLTI low-pass filter.

Functional JAX redesign of the paper's deblurring contribution
(reference: deblur_e_nerf/models/pixel_bandwidth.py:7-494): a cascade of a
2nd-order non-linear photoreceptor LPF, a 1st-order source-follower LPF and
a 1st-order differencing-amplifier LPF, linearized at per-sample steady
states, FOH-discretized, and collapsed into per-sample output weights.

TPU-first translation decisions:
  - The reference's Python loop over S for the weight recursion
    (reference: pixel_bandwidth.py:283-294) becomes a reversed `lax.scan`
    over batched (N, o, 4) x (N, 4, 4) products.
  - The stateful differencing-amplifier reset
    (`self.reset_delta_log_it` / `self.reset_ts` module attributes,
    reference: pixel_bandwidth.py:419-423) is threaded explicitly as a
    `ResetState` value: the `reset_diff=True` render within a training step
    produces the state, the other renders of the same step consume it.
  - Timestamp math stays float64 (ns); all state-space math is float32 —
    the reference likewise runs FOH in the default torch dtype.

Six learnable softplus-positive parameters: tau_mil_it_eff_prod, A_amp_inv,
A_loop_inv, tau_out, tau_sf, tau_diff; `tau_in_it_eff_prod` is a constant
(reference: pixel_bandwidth.py:119-153) — tau_in = tau_in_it_eff_prod / it,
making the NeRF intensity scale observable through the filter dynamics.
"""

import functools
import math
import os
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..ops import activations, control

TAU_IN_IT_EFF_PROD_KEY = "input_time_const_eff_it_prod"
TAU_MIL_IT_EFF_PROD_KEY = "miller_time_const_eff_it_prod"
A_AMP_KEY = "amplifier_gain"
A_CL_KEY = "closed_loop_gain"
TAU_OUT_KEY = "output_time_const"
F_C_SF_KEY = "sf_cutoff_freq"
F_C_DIFF_KEY = "diff_amp_cutoff_freq"
NS_TO_S = 1e-9


class ResetState(NamedTuple):
    """Differencing-amp reset state, produced by the reset_diff render.

    Timestamps are split (int64 base, float32 differentiable delta); see
    models/trajectory.py for why float64 device math is unusable here.
    """
    reset_delta_log_it: jnp.ndarray  # (N,) float32
    reset_ts: jnp.ndarray            # (N,) int64 ns base
    reset_ts_delta: jnp.ndarray      # (N,) float32 ns offset


def init_pixel_bandwidth(camera_calibration, min_ts, f_c_dominant_min,
                         target_cumprob_max_sample_lifetime):
    """Build {params, consts} from calibrated pixel-circuit constants."""
    tau_in_prod = float(camera_calibration[TAU_IN_IT_EFF_PROD_KEY])
    tau_mil_prod = float(camera_calibration[TAU_MIL_IT_EFF_PROD_KEY])
    A_amp = float(camera_calibration[A_AMP_KEY])
    A_cl = float(camera_calibration[A_CL_KEY])
    tau_out = float(camera_calibration[TAU_OUT_KEY])
    f_c_sf = float(camera_calibration[F_C_SF_KEY])
    f_c_diff = float(camera_calibration[F_C_DIFF_KEY])

    def raw(v):
        return activations.softplus_inverse(jnp.asarray(v, jnp.float32))

    params = {
        "tau_mil_it_eff_prod_raw": raw(tau_mil_prod),
        "A_amp_inv_raw": raw(1.0 / A_amp),
        "A_loop_inv_raw": raw(A_cl / A_amp),
        "tau_out_raw": raw(tau_out),
        "tau_sf_raw": raw(1.0 / (2 * math.pi * f_c_sf)),
        "tau_diff_raw": raw(1.0 / (2 * math.pi * f_c_diff)),
    }
    consts = {
        "tau_in_it_eff_prod": jnp.asarray(tau_in_prod, jnp.float32),
        "min_ts": jnp.asarray(min_ts, jnp.int64),
        "omega_c_dominant_min": jnp.asarray(
            2 * math.pi * f_c_dominant_min, jnp.float64
        ),  # rad/s
        "target_cumprob_max_sample_lifetime": jnp.asarray(
            target_cumprob_max_sample_lifetime, jnp.float64
        ),
    }
    return params, consts


def effective_params(params):
    """Softplus-positive reads of the six learnable parameters."""
    sp = activations.softplus
    return {
        "tau_mil_it_eff_prod": sp(params["tau_mil_it_eff_prod_raw"]),
        "A_amp_inv": sp(params["A_amp_inv_raw"]),
        "A_loop_inv": sp(params["A_loop_inv_raw"]),
        "tau_out": sp(params["tau_out_raw"]),
        "tau_sf": sp(params["tau_sf_raw"]),
        "tau_diff": sp(params["tau_diff_raw"]),
    }


def linearized_sys_params(params, consts, steady_state_intensity):
    """Linearized 2nd-order sub-system params at given steady states
    (reference: pixel_bandwidth.py:181-194)."""
    eff = effective_params(params)
    tau_in = consts["tau_in_it_eff_prod"] / steady_state_intensity
    tau_mil = eff["tau_mil_it_eff_prod"] / steady_state_intensity
    A_amp = 1.0 / eff["A_amp_inv"]
    A_loop = 1.0 / eff["A_loop_inv"]
    denom = (tau_in + tau_mil) * eff["tau_out"]
    two_zeta_omega_n = (
        tau_in + eff["tau_out"] + (A_amp + 1) * tau_mil
    ) / denom
    omega_n_square = (A_loop + 1) / denom
    omega_c_sf = 1.0 / eff["tau_sf"]
    omega_c_diff = 1.0 / eff["tau_diff"]
    return two_zeta_omega_n, omega_n_square, omega_c_sf, omega_c_diff


def linearize_sys(params, consts, steady_state_intensity,
                  output_sf_log_it=False):
    """Build the batched linearized 4x4 state space
    (reference: pixel_bandwidth.py:196-228)."""
    two_zeta_omega_n, omega_n_square, omega_c_sf, omega_c_diff = (
        linearized_sys_params(params, consts, steady_state_intensity)
    )
    shape = steady_state_intensity.shape
    dtype = steady_state_intensity.dtype
    zeros = jnp.zeros(shape, dtype)
    ones = jnp.ones(shape, dtype)

    def bc(v):
        return jnp.broadcast_to(jnp.asarray(v, dtype), shape)

    A = jnp.stack([
        jnp.stack([-two_zeta_omega_n, -omega_n_square, zeros, zeros], -1),
        jnp.stack([ones, zeros, zeros, zeros], -1),
        jnp.stack([zeros, bc(omega_c_sf), -bc(omega_c_sf), zeros], -1),
        jnp.stack([zeros, zeros, bc(omega_c_diff), -bc(omega_c_diff)], -1),
    ], axis=-2)
    B = jnp.stack(
        [omega_n_square, zeros, zeros, zeros], axis=-1
    )[..., None]
    if output_sf_log_it:
        C = jnp.asarray([[0, 0, 1, 0], [0, 0, 0, 1]], dtype)
    else:
        C = jnp.asarray([[0, 0, 0, 1]], dtype)
    C = jnp.broadcast_to(C, (*shape, *C.shape))
    D = jnp.zeros((*shape, C.shape[-2], 1), dtype)
    return control.StateSpace(A=A, B=B, C=C, D=D)


def linearized_sys_omega_c_dominant(params, consts,
                                    steady_state_intensity,
                                    reset_diff=False):
    """Approximate dominant cutoff angular frequency
    (reference: pixel_bandwidth.py:230-258)."""
    two_zeta_omega_n, omega_n_square, omega_c_sf, omega_c_diff = (
        linearized_sys_params(params, consts, steady_state_intensity)
    )
    zeta_omega_n = two_zeta_omega_n / 2
    disc = jnp.square(zeta_omega_n) - omega_n_square
    j_omega_d = jnp.sqrt(jnp.maximum(disc, 0.0))
    omega_n = jnp.sqrt(omega_n_square)
    omega_c_nlti = jnp.where(
        zeta_omega_n >= omega_n, zeta_omega_n - j_omega_d, omega_n
    )
    omega_c = jnp.minimum(omega_c_nlti, omega_c_sf)
    if not reset_diff:
        omega_c = jnp.minimum(omega_c, omega_c_diff)
    return omega_c


def discretized_sys_to_weight(sysd, matrix_leading_in=False,
                              x0_dir=None):
    """Collapse the LTV discrete system into per-sample output weights.

    y[S-1] = sum_i w[i] u[i] with
      w[0]   = C phi(1, S-1) B[0]            [+ C phi(0, S-1) x0_dir]
      w[i]   = C phi(i+1, S-1) B[i] + C phi(i, S-1) Bt[i-1]
      w[S-1] = C Bt[S-2] + D
    computed with a reversed lax.scan carrying C phi(i+1, S-1)
    (reference: pixel_bandwidth.py:260-296 uses a Python loop).

    x0_dir: optional (n, m[, batch...]) initial-state direction: the
    system starts at x[0] = x0_dir @ u[0] (steady state for the first
    input) instead of x[0] = 0. The reference omits the initial-state
    response and hides the deficit with weight normalization
    (pixel_bandwidth.py:398-401) — exact only when the window is much
    longer than every time constant. For a window clamped to the
    dataset start (all dts at the 100 ns floor) the weights sum to
    ~1e-7 * DC and the normalization divides f32 cancellation noise
    (observed: exact-0 sum on TPU -> inf -> NaN gradients through the
    masked lanes). With x0_dir the weights sum to the DC gain exactly,
    for ANY window length and parameters.
    """
    # matrix-leading layout: tiny (o, n)/(n, m) dims lead, batch dims land
    # on the hardware tiles (see ops/linalg.py)
    if matrix_leading_in:
        # FOH output already (n, n|m, S-1, batch...): only hoist the scan
        # axis (a major-dim reshuffle — no tile-padding blowup)
        A = jnp.moveaxis(sysd.A, (0, 1), (1, 2))   # (S-1, n, n, ...)
        B = jnp.moveaxis(sysd.B, (0, 1), (1, 2))   # (S-1, n, m, ...)
        Bt = jnp.moveaxis(sysd.B_tilde, (0, 1), (1, 2))
    else:
        A = jnp.moveaxis(sysd.A, (-2, -1), (1, 2))    # (S-1, n, n, ...)
        B = jnp.moveaxis(sysd.B, (-2, -1), (1, 2))    # (S-1, n, m, ...)
        Bt = jnp.moveaxis(sysd.B_tilde, (-2, -1), (1, 2))
    C = jnp.moveaxis(sysd.C[0], (-2, -1), (0, 1))  # (o, n, ...)
    D = jnp.moveaxis(sysd.D[0], (-2, -1), (0, 1))  # (o, m, ...)
    S = A.shape[0] + 1
    mm = lambda x, y: jnp.einsum("ij...,jk...->ik...", x, y)  # noqa: E731

    batch_shape = A.shape[3:]
    C = jnp.broadcast_to(C, (*C.shape[:2], *batch_shape))
    w_last = mm(C, Bt[S - 2]) + D  # (o, m, ...)

    def body(c_phi, inputs):
        # c_phi = C phi(i+1, S-1); inputs at index i in [S-2, ..., 1]
        A_i, B_i, Bt_im1 = inputs
        c_phi_i = mm(c_phi, A_i)  # C phi(i, S-1)
        w_i = mm(c_phi, B_i) + mm(c_phi_i, Bt_im1)
        return c_phi_i, w_i

    if S > 2:
        xs = (A[1:S - 1], B[1:S - 1], Bt[0:S - 2])
        c_phi_1, w_mid = jax.lax.scan(body, C, xs, reverse=True)
    else:
        c_phi_1, w_mid = C, jnp.zeros((0, *w_last.shape), w_last.dtype)
    w_first = mm(c_phi_1, B[0])
    if x0_dir is not None:
        # C phi(0, S-1) x0_dir = (C phi(1, S-1)) A[0] x0_dir
        w_first = w_first + mm(c_phi_1, mm(A[0], x0_dir))
    weight = jnp.concatenate(
        [w_first[None], w_mid, w_last[None]], axis=0
    )  # (S, o, m, ...)
    return jnp.moveaxis(weight, (1, 2), (-2, -1))  # (S, ..., o, m)


def split_time(base, delta):
    """Renormalize a split timestamp: move the integer part of `delta`
    into the int64 `base` with a straight-through gradient, leaving a
    sub-nanosecond float32 remainder (full d/d(delta) preserved)."""
    r = jnp.round(delta)
    return (
        base + r.astype(jnp.int64),
        delta - jax.lax.stop_gradient(r),
    )


def sample_lifetimes(params, consts, normalized_interval_gen):
    """Importance-sample input-sample lifetimes (ns BEFORE the output
    timestamp) via the exponential-distribution inverse-CDF
    (reference: pixel_bandwidth.py:298-367). No gradients flow through the
    lifetimes (stop_gradient), matching the reference's no_grad block.
    Returns (S, ...) float32 lifetimes, descending to 0 at the output."""
    S = normalized_interval_gen.shape[0] + 1
    batch_shape = normalized_interval_gen.shape[1:]

    boundary = jnp.linspace(1.0, 0.0, S, dtype=jnp.float32)
    boundary = boundary.reshape(-1, *([1] * len(batch_shape)))
    gen = normalized_interval_gen.astype(jnp.float32)
    interval = boundary[:-1] + gen * (boundary[1:] - boundary[:-1])

    mid = 0.5 * (interval[:-1] + interval[1:])  # (S-2, ...)
    ones = jnp.ones_like(interval[:1])
    zeros = jnp.zeros_like(ones)
    normalized_lifetime = jnp.concatenate([ones, mid, zeros], axis=0)

    rate = NS_TO_S * consts["omega_c_dominant_min"].astype(jnp.float32)
    p = consts["target_cumprob_max_sample_lifetime"].astype(jnp.float32) \
        * normalized_lifetime
    lifetime = -jnp.log1p(-p) / rate  # exponential ICDF, in ns
    return jax.lax.stop_gradient(lifetime)


@functools.partial(jax.checkpoint, static_argnums=(0,))
def _weight_remat(output_sf_log_it, params, consts, intensity_sample,
                  sample_dt):
    lin_sys = linearize_sys(
        params, consts, intensity_sample[1:], output_sf_log_it
    )
    sysd = control.foh_cont2discrete(
        lin_sys, NS_TO_S * sample_dt, is_state_preserved=True,
        is_efficient=True, matrix_leading_out=True,
    )
    # the circuit starts at the steady state for the first sample's
    # (log-)intensity: x_ss(u) = [0, u, u, u] for EVERY linearization
    # point (each stage has unit DC gain), so the initial-state
    # direction is a constant vector and the weights sum to the DC
    # gain (= 1) exactly — see discretized_sys_to_weight.
    x0_dir = jnp.asarray([0.0, 1.0, 1.0, 1.0],
                         intensity_sample.dtype).reshape(4, 1)
    weight = discretized_sys_to_weight(
        sysd, matrix_leading_in=True, x0_dir=x0_dir
    )  # (S, ..., o, 1)
    return weight[..., 0]  # (S, ..., o)


def intensity_sample_to_weight(params, consts, intensity_sample,
                               sample_dt, output_sf_log_it=False):
    """Linearize + FOH-discretize + collapse to weights
    (reference: pixel_bandwidth.py:369-396). sample_dt in ns, float32.

    Rematerialized: the expm squaring chain would otherwise persist its
    per-iteration residual stack from forward to backward.
    """
    return _weight_remat(
        bool(output_sf_log_it), params, consts, intensity_sample,
        sample_dt,
    )


def _collapse_weighted_log_it(weight, intensity_sample):
    """Weight-normalized log-intensity collapse shared by `forward` and
    `forward_fused`: (S, ..., o) weights x (S, ...) intensities ->
    (..., o) output log-intensities."""
    normalized_weight = weight / jnp.sum(weight, axis=0, keepdims=True)
    log_it = jnp.log(intensity_sample)[..., None]  # (S, ..., 1)
    return jnp.sum(normalized_weight * log_it, axis=0)  # (..., o)


def _reset_decay(params, reset_state, ts, ts_delta):
    """Differencing-amp reset correction decayed from reset_state's
    timestamp to (ts, ts_delta); shared by `forward` and
    `forward_fused`."""
    eff = effective_params(params)
    omega_c_diff = 1.0 / eff["tau_diff"]
    reset_dt = (
        (ts - reset_state.reset_ts).astype(
            reset_state.reset_delta_log_it.dtype)
        + (ts_delta - reset_state.reset_ts_delta)
    )
    return reset_state.reset_delta_log_it * jnp.exp(
        -omega_c_diff * (NS_TO_S * reset_dt)
    )


def weighted_samples_to_output_log_it(params, weight, intensity_sample,
                                      last_sample_ts, last_sample_delta,
                                      reset_state, reset_diff=False):
    """Weight-normalized log-intensity synthesis + differencing-amp reset
    (reference: pixel_bandwidth.py:398-448). Returns
    (output_log_intensity, new_reset_state)."""
    out = _collapse_weighted_log_it(weight, intensity_sample)

    if reset_diff:
        sf_log_it = out[..., 0]
        diff_log_it_bfr_reset = out[..., 1]
        new_state = ResetState(
            reset_delta_log_it=diff_log_it_bfr_reset - sf_log_it,
            reset_ts=last_sample_ts,
            reset_ts_delta=last_sample_delta,
        )
        # resetting pins the diff-amp output to its input (sf output)
        return sf_log_it, new_state

    diff_log_it_bfr_reset = out[..., 0]
    decayed = _reset_decay(params, reset_state, last_sample_ts,
                           last_sample_delta)
    return diff_log_it_bfr_reset - decayed, reset_state


def _sample_times(params, consts, normalized_interval_gen, output_ts,
                  output_ts_delta):
    """Split sample timestamps (S, ...) from lifetimes, clamped to the
    dataset start (reference min-ts clamp)."""
    lifetime = sample_lifetimes(params, consts, normalized_interval_gen)
    base, delta = split_time(
        jnp.broadcast_to(output_ts, lifetime.shape),
        output_ts_delta - lifetime,
    )
    min_ts = consts["min_ts"]
    rel = (base - min_ts).astype(jnp.float32) + delta
    below = rel < 0
    base = jnp.where(below, min_ts, base)
    delta = jnp.where(below, 0.0, delta)
    # exact split-time differences; FOH needs dt > 0, so clamped-equal
    # consecutive samples get a small positive step. The floor must be
    # LARGE enough for float32 FOH backward: at dt -> 0 the efficient
    # discretization solves a 4x4 with entries ~||A||*dt and its VJP
    # carries 1/dt^2-scale factors — at the old 1e-6 ns floor (1e-15 s)
    # the cotangents overflow f32 to inf, NaN-ing every parameter on
    # the timestamp path (refractory/CT/taus/background) within a few
    # optimizer steps. 100 ns (1e-7 s) keeps ||A*dt|| >= ~1e-3 for all
    # modeled circuits while remaining ~1e6x shorter than any sampled
    # lifetime interval — numerically invisible in the weights.
    dt = (
        (base[1:] - base[:-1]).astype(jnp.float32)
        + (delta[1:] - delta[:-1])
    )
    dt = jnp.maximum(dt, 100.0)
    return base, delta, dt


def forward_fused(params, consts, normalized_interval_gen, output_ts,
                  output_ts_delta, intensity_sampling_fn, slice_size):
    """Single-render pixel-bandwidth pass over a whole training step.

    The reference runs four sequential renders per step (diff start/end,
    subdiff start/end; reference: deblur_e_nerf.py:472-526) whose only
    data dependency is the differencing-amp reset correction — a cheap
    elementwise term. Here all output timestamps are batched into ONE
    render (4x larger matmuls, 4x smaller program): the first
    `slice_size` entries act as the reset_diff producer and the remaining
    slices consume its reset state, with both the source-follower and
    diff-amp outputs computed for every sample (o=2; the extra output row
    costs two 4-vectors per scan step).

    Args:
        normalized_interval_gen: (S-1, R*N) in [0, 1].
        output_ts: (R*N,) int64 ns — R slices of N events each.
        output_ts_delta: (R*N,) float32 differentiable offset.
        slice_size: N.
    Returns:
        (output_log_intensity (R*N,), aux_outputs, ResetState)
    """
    output_ts_delta = jnp.broadcast_to(
        jnp.asarray(output_ts_delta, jnp.float32), output_ts.shape
    )
    sample_base, sample_delta, sample_dt = _sample_times(
        params, consts, normalized_interval_gen, output_ts,
        output_ts_delta,
    )
    sampling_output = intensity_sampling_fn(sample_base, sample_delta)
    intensity_sample = sampling_output[0]
    aux = sampling_output[1:]

    weight = intensity_sample_to_weight(
        params, consts, intensity_sample, sample_dt,
        output_sf_log_it=True,
    )  # (S, R*N, 2): rows [sf, diff]
    if os.environ.get("DENERF_DEBUG_NANS"):
        # trace-time NaN-localization metrics (stats dict pass-through
        # via dbg_ prefix; see training/step.py) for hunting
        # platform-specific non-finites in the blur forward pass
        stats = dict(
            aux[0],
            dbg_nonfinite_intensity=jnp.sum(
                ~jnp.isfinite(intensity_sample)).astype(jnp.float32),
            dbg_min_intensity=jnp.min(intensity_sample),
            dbg_nonfinite_weight=jnp.sum(
                ~jnp.isfinite(weight)).astype(jnp.float32),
            dbg_min_abs_wsum=jnp.min(jnp.abs(
                jnp.sum(weight, axis=0, keepdims=True))),
            dbg_min_sample_dt=jnp.min(sample_dt),
            dbg_max_abs_delta=jnp.max(jnp.abs(output_ts_delta)),
        )
        aux = (stats,) + tuple(aux[1:])
    out = _collapse_weighted_log_it(weight, intensity_sample)  # (R*N, 2)
    sf_log_it = out[..., 0]
    diff_log_it_bfr_reset = out[..., 1]

    n = slice_size
    n_slices = out.shape[0] // n
    new_state = ResetState(
        reset_delta_log_it=diff_log_it_bfr_reset[:n] - sf_log_it[:n],
        reset_ts=output_ts[:n],
        reset_ts_delta=output_ts_delta[:n],
    )
    tiled_state = ResetState(
        reset_delta_log_it=jnp.tile(new_state.reset_delta_log_it,
                                    n_slices),
        reset_ts=jnp.tile(new_state.reset_ts, n_slices),
        reset_ts_delta=jnp.tile(new_state.reset_ts_delta, n_slices),
    )
    decayed = _reset_decay(params, tiled_state, output_ts,
                           output_ts_delta)
    out_all = jnp.concatenate([
        sf_log_it[:n],                                 # reset slice
        (diff_log_it_bfr_reset - decayed)[n:],         # consumers
    ])
    return out_all, aux, new_state


def forward(params, consts, normalized_interval_gen, output_ts,
            intensity_sampling_fn, reset_state=None, reset_diff=False,
            output_ts_delta=0.0):
    """Full pixel-bandwidth forward pass
    (reference: pixel_bandwidth.py:450-494).

    Args:
        normalized_interval_gen: (S-1, ...) in [0, 1].
        output_ts: (...) int64 ns (floats accepted, truncated to ns).
        intensity_sampling_fn: (sample_ts (S, ...) int64 ns,
            sample_ts_delta (S, ...) float32) -> tuple whose first element
            is the sampled intensity (S, ...); the rest are auxiliary
            outputs passed through.
        reset_state: ResetState from the reset_diff render of this step
            (required when reset_diff=False).
        reset_diff: produce (and return) a fresh ResetState.
        output_ts_delta: float32 differentiable ns offset on output_ts.
    Returns:
        (output_log_intensity (...), aux_outputs, reset_state)
    """
    output_ts = jnp.asarray(output_ts)
    if not jnp.issubdtype(output_ts.dtype, jnp.integer):
        output_ts = output_ts.astype(jnp.int64)
    output_ts_delta = jnp.broadcast_to(
        jnp.asarray(output_ts_delta, jnp.float32), output_ts.shape
    )
    sample_base, sample_delta, sample_dt = _sample_times(
        params, consts, normalized_interval_gen, output_ts,
        output_ts_delta,
    )
    sampling_output = intensity_sampling_fn(sample_base, sample_delta)
    intensity_sample = sampling_output[0]
    aux = sampling_output[1:]

    weight = intensity_sample_to_weight(
        params, consts, intensity_sample, sample_dt,
        output_sf_log_it=reset_diff,
    )
    out_log_it, new_reset_state = weighted_samples_to_output_log_it(
        params, weight, intensity_sample, output_ts, output_ts_delta,
        reset_state, reset_diff,
    )
    return out_log_it, aux, new_reset_state
