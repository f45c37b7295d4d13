"""Host-side training data pipeline.

Analog of the reference's IterableMapDataset + DataModule combination
(reference: deblur_e_nerf/utils/datasets.py:20-32, data/datamodule.py:8-247)
redesigned for static device shapes: each step samples `active_size` random
event indices (with replacement, like the reference's `torch.randint`
sampler) into a fixed-capacity batch with a validity prefix mask. The
*capacity* never changes (zero recompiles); the *active* count is the
dynamic-batch-size control variable
(reference: deblur_e_nerf.py:1252-1308).

Normalized interval samples are NOT drawn here — they come from the step's
on-device PRNG key (training/step.py), removing the reference's
host-sampler <-> batch-size mutation coupling entirely (the reason it had
to forbid dataloader workers; data/datamodule.py:37-42).
"""

import numpy as np


class EventBatcher:
    def __init__(self, events, capacity, seed=0, dataset_len=None,
                 has_bayer=False, interleave=1):
        """
        Args:
            events: packed events dict of numpy arrays.
            capacity: static batch capacity N.
            dataset_len: optional trim (reference TrimDataset semantics).
            interleave: mesh size for data-parallel runs — active rows
                are placed round-robin across the `interleave` equal
                shards of the capacity so every device gets equal work
                (the reference's per-rank decorrelated DDP batches,
                reference: data/datamodule.py:85-91, achieved by layout).
        """
        self.events = events
        self.capacity = int(capacity)
        self.n = int(dataset_len or len(events["position"]))
        self.rng = np.random.Generator(np.random.Philox(seed))
        self.has_bayer = has_bayer
        self.interleave = int(interleave)
        assert self.capacity % max(self.interleave, 1) == 0

    def next_batch(self, active_size):
        active = int(min(max(active_size, 1), self.capacity))
        idx = self.rng.integers(0, self.n, size=active)
        cap = self.capacity
        if self.interleave > 1:
            shard = cap // self.interleave
            k = np.arange(active)
            rows = (k % self.interleave) * shard + k // self.interleave
        else:
            rows = np.arange(active)

        def take(key, dtype, fill=0):
            arr = self.events[key][idx]
            out = np.full((cap, *arr.shape[1:]), fill, dtype=dtype)
            out[rows] = arr
            return out

        valid = np.zeros(cap, bool)
        valid[rows] = True
        batch = {
            "position": take("position", np.float32),
            "start_ts": take("start_ts", np.int64),
            "end_ts": take("end_ts", np.int64, fill=1),
            "num_pos": take("num_pos", np.float32),
            "num_neg": take("num_neg", np.float32),
            "valid": valid,
        }
        if self.has_bayer:
            batch["channel_idx"] = take("channel_idx", np.int32)
        return batch


class BatchSizeController:
    """Dynamic active-batch-size control from the samples-per-ray signal
    (reference: deblur_e_nerf.py:1252-1308): active ~= target_ray_samples /
    mean_num_samples_per_ray, clamped to capacity."""

    def __init__(self, target_ray_samples, init_batch_size, capacity,
                 min_batch=1):
        self.target = float(target_ray_samples)
        self.capacity = int(capacity)
        self.active = int(min(init_batch_size, capacity))
        # framework-extension floor (reference floor is 1, via ceil:
        # deblur_e_nerf.py:1252-1308): during occupancy-fog bursts
        # samples/ray explodes and the reference rule starves the step
        # to a handful of events; a floor keeps supervision alive and
        # relies on the renderer's per-ray truncation masking
        # (step.py ray_complete) to keep over-budget rays out of the loss
        self.min_batch = int(max(1, min(min_batch, capacity)))

    def update(self, mean_num_samples_per_ray):
        m = float(mean_num_samples_per_ray)
        if m > 0 and np.isfinite(m):
            self.active = int(
                np.clip(self.target / m, self.min_batch, self.capacity)
            )
        return self.active
