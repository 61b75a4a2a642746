#!/usr/bin/env python
"""Convert torchvision backbone + lpips calibration weights to the .npz
layout tensorf_tpu/eval/lpips_jax.py loads.

Run this on any machine WITH network access / the packages installed:

    pip install torch torchvision lpips
    python scripts/convert_lpips_weights.py alex
    python scripts/convert_lpips_weights.py vgg

then copy the produced tensorf_tpu/eval/weights/lpips_{net}.npz into the
zero-egress environment (or set TENSORF_LPIPS_DIR).
"""

import os
import sys

import numpy as np


def main(net: str):
    import lpips as lpips_pkg
    import torch

    model = lpips_pkg.LPIPS(net=net, version="0.1").eval()
    out = {}
    # backbone convs in forward order
    convs = [
        m
        for m in model.net.slice1.modules()
    ]
    # walk all slices in order, collecting Conv2d
    conv_idx = 0
    for slice_name in ("slice1", "slice2", "slice3", "slice4", "slice5"):
        sl = getattr(model.net, slice_name)
        for m in sl.modules():
            if isinstance(m, torch.nn.Conv2d):
                w = m.weight.detach().numpy()  # (out, in, k, k)
                out[f"conv{conv_idx}.w"] = np.transpose(w, (2, 3, 1, 0))
                out[f"conv{conv_idx}.b"] = m.bias.detach().numpy()
                conv_idx += 1
    for k, lin in enumerate(model.lins):
        w = lin.model[-1].weight.detach().numpy()  # (1, C, 1, 1)
        out[f"lin{k}.w"] = np.clip(w.reshape(-1), 0, None)
    dst = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "..", "tensorf_tpu", "eval", "weights", f"lpips_{net}.npz",
    )
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    np.savez(dst, **out)
    print(f"wrote {dst} ({conv_idx} convs, {k + 1} lins)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "alex")
