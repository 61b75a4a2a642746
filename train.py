#!/usr/bin/env python
"""CLI entry — same surface as the reference's train.py.

Usage:
  python train.py --config configs/lego.txt [--flag value ...]
  python train.py --config configs/config.yaml
  python train.py --config ... --render_only 1 --render_test 1 --ckpt x.npz
  python train.py --config ... --export_mesh 1 --ckpt x.npz
"""

import os
import sys

# persistent XLA compile cache: each schedule segment re-traces the train
# step; cached segment recompiles take seconds instead of minutes on
# remote-compiled backends.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

from tensorf_tpu.utils.cache import enable_compile_cache
enable_compile_cache()

from tensorf_tpu.config.frontends import parse_cli
from tensorf_tpu.train.loop import export_mesh, reconstruction, render_test


def _supervise(argv, retries: int) -> int:
    """Run the training CLI in a child process; on the watchdog's wedged
    exit (code 17, utils/watchdog.py) relaunch with --resume 1 so the run
    continues from its newest periodic checkpoint — up to ``retries``
    relaunches, no operator in the loop."""
    import subprocess

    from tensorf_tpu.utils.watchdog import EXIT_WEDGED

    base = [sys.executable, os.path.abspath(__file__)]
    child_argv = [a for a in argv]
    # the child must not re-supervise
    child_argv += ["--auto_resume", "0"]
    rc = subprocess.call(base + child_argv)
    attempt = 0
    while rc == EXIT_WEDGED and attempt < retries:
        attempt += 1
        print(
            f"[supervisor] wedged exit (code {rc}) — relaunch "
            f"{attempt}/{retries} with --resume 1",
            flush=True,
        )
        rc = subprocess.call(base + child_argv + ["--resume", "1"])
    if rc == EXIT_WEDGED:
        print(
            f"[supervisor] still wedged after {retries} relaunches — "
            "giving up (resume later with --resume 1)",
            flush=True,
        )
    return rc


def main(argv=None):
    if argv is None:
        argv = sys.argv[1:]
    cfg = parse_cli(argv)

    if cfg.platform:
        import jax

        jax.config.update("jax_platforms", cfg.platform)
        # multi-process CPU runs (scripts/multihost_smoke.py): device count
        # and the cross-process collectives backend must be set before the
        # backend initializes — env vars are read here because
        # sitecustomize pins the platform at interpreter start
        if os.environ.get("TFTPU_CPU_DEVICES"):
            jax.config.update(
                "jax_num_cpu_devices", int(os.environ["TFTPU_CPU_DEVICES"])
            )
        if os.environ.get("TFTPU_CPU_COLLECTIVES"):
            jax.config.update(
                "jax_cpu_collectives_implementation",
                os.environ["TFTPU_CPU_COLLECTIVES"],
            )

    if cfg.auto_resume and argv:
        sys.exit(_supervise(list(argv), int(cfg.auto_resume)))

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
