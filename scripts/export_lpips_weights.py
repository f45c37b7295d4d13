#!/usr/bin/env python
"""Export LPIPS(alex) weights + golden outputs for the native metric.

Run this OUTSIDE the zero-egress training environment (anywhere the
`lpips` pip package and its pretrained weights are available):

    python scripts/export_lpips_weights.py --out lpips_alex.pt \
        --golden tests/fixtures/lpips_alex_golden.npz

It saves
  1. the full `lpips.LPIPS(net='alex')` state dict (torchvision AlexNet
     backbone + learned linear heads + scaling layer) in exactly the key
     layout `training/metrics.py:_build_lpips_alex` loads, and
  2. a golden fixture: deterministic random image pairs and the official
     package's LPIPS values for them.

Back in the training environment, point `metric.lpips_weights_path` at
the exported file (reference config key: the reference instead downloads
through torchvision's zoo at import time — loss_metric/metric.py:84-90)
and run `tests/test_lpips.py::test_lpips_golden_fixture` to verify the
native implementation reproduces the official package bit-for-bit-close.
"""

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--net", default="alex",
                        choices=("alex", "vgg", "squeeze", "all"))
    parser.add_argument("--out", default=None,
                        help="state-dict path (default lpips_<net>.pt)")
    parser.add_argument("--golden", default=None,
                        help="golden fixture path (default "
                             "tests/fixtures/lpips_<net>_golden.npz)")
    parser.add_argument("--num-pairs", type=int, default=4)
    parser.add_argument("--size", type=int, default=64)
    args = parser.parse_args()

    import lpips  # noqa: F401 (requires egress-capable environment)
    import torch

    nets = ("alex", "vgg", "squeeze") if args.net == "all" \
        else (args.net,)
    if len(nets) > 1 and (args.out or args.golden):
        parser.error(
            "--net all with an explicit --out/--golden would write every"
            " backbone to the same path (only the last would survive);"
            " drop the explicit paths or export one net at a time"
        )
    for net in nets:
        out = args.out or f"lpips_{net}.pt"
        golden = args.golden or \
            f"tests/fixtures/lpips_{net}_golden.npz"
        model = lpips.LPIPS(net=net)
        model.eval()
        torch.save(model.state_dict(), out)
        print(f"{net} state dict -> {out}")

        rng = np.random.default_rng(20240917)
        pairs_a = rng.uniform(
            -1, 1, (args.num_pairs, 3, args.size, args.size)
        ).astype(np.float32)
        pairs_b = np.clip(
            pairs_a + rng.normal(0, 0.2, pairs_a.shape), -1, 1
        ).astype(np.float32)
        with torch.no_grad():
            values = model(
                torch.from_numpy(pairs_a), torch.from_numpy(pairs_b)
            ).reshape(-1).numpy()
        np.savez(golden, a=pairs_a, b=pairs_b, lpips=values)
        print(f"golden fixture -> {golden}: {values}")


if __name__ == "__main__":
    main()
