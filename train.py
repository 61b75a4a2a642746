#!/usr/bin/env python
"""CLI entry — same surface as the reference's train.py.

Usage:
  python train.py --config configs/lego.txt [--flag value ...]
  python train.py --config configs/config.yaml
  python train.py --config ... --render_only 1 --render_test 1 --ckpt x.npz
  python train.py --config ... --export_mesh 1 --ckpt x.npz
"""

import sys

from tensorf_tpu.config.frontends import parse_cli
from tensorf_tpu.train.loop import export_mesh, reconstruction, render_test


def main(argv=None):
    cfg = parse_cli(argv)

    if cfg.export_mesh and (cfg.ckpt or cfg.ckpt_path):
        export_mesh(cfg)
        return

    if cfg.render_only and (cfg.render_test or cfg.render_path or cfg.render_train):
        render_test(cfg)
        return

    ckpt_path = reconstruction(cfg)
    if cfg.export_mesh:
        export_mesh(cfg, ckpt_path)


if __name__ == "__main__":
    main(sys.argv[1:])
