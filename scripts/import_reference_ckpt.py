#!/usr/bin/env python
"""Convert a reference PyTorch checkpoint (.th) to a native .npz.

The reference writes {kwargs, state_dict} + a bit-packed alpha mask via
torch.save (models/tensorBase.py:160-168).  This tool maps it onto our
channels-last pytree checkpoint so render/export/resume entry points can
use models trained by the reference.  (Every --ckpt flag also accepts the
.th directly — utils/ckpt.py::load_checkpoint converts in memory; this
script is for one-time offline conversion.)

Usage: python scripts/import_reference_ckpt.py in.th [out.npz]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("input", help="reference .th checkpoint")
    ap.add_argument("output", nargs="?", default=None,
                    help="output .npz path (default: input with .npz)")
    args = ap.parse_args()
    out = args.output or (os.path.splitext(args.input)[0] + ".npz")

    # conversion is pure host work: force the CPU backend BEFORE any jax
    # array is built, so a wedged TPU tunnel can never hang the converter
    # (the r3 incident pattern — see __graft_entry__.py / conftest.py)
    import jax

    jax.config.update("jax_platforms", "cpu")
    from tensorf_tpu.utils.import_torch import convert

    written = convert(args.input, out)
    print(f"[import] {args.input} -> {written}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
