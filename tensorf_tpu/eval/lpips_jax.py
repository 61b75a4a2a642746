"""LPIPS (v0.1) perceptual distance in JAX.

Reference computes LPIPS-alex and LPIPS-vgg per test image via the torch
``lpips`` package (reference loss.py:144-159, renderer.py:186-198).  This
is a first-party JAX implementation of the same metric: an AlexNet / VGG16
feature stack, unit-normalized channel activations, squared differences
re-weighted by the LPIPS linear calibration layers, spatially averaged and
summed over taps.

Weights are NOT bundled (zero-egress build environment, and the backbone
weights are ~60-240MB).  Provide them as a single .npz per net, produced by
``scripts/convert_lpips_weights.py`` on any machine with torchvision +
lpips installed, and point ``TENSORF_LPIPS_DIR`` at the directory (default:
``tensorf_tpu/eval/weights/``).  Without weights, callers get None and
evaluation writes NaN into mean.txt's LPIPS lines (explicitly, not by
shortening the file).

npz layout (all conv weights HWIO, biases (O,)):
  conv{i}.w / conv{i}.b   backbone convs in forward order
  lin{k}.w                (C_k,) non-negative LPIPS calibration weights
  meta: net ("alex"|"vgg"), taps (indices of convs after whose ReLU a
  tap is taken)
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import numpy as np

# (out_ch, kernel, stride, pad, tap_after) per conv; pools are applied
# before convs listed in `pool_before`.
_ALEX = {
    "convs": [
        (64, 11, 4, 2),
        (192, 5, 1, 2),
        (384, 3, 1, 1),
        (256, 3, 1, 1),
        (256, 3, 1, 1),
    ],
    "pool_before": {1, 2},  # maxpool(3, 2) before conv2 and conv3
    "taps": [0, 1, 2, 3, 4],
}
_VGG = {
    "convs": [
        (64, 3, 1, 1), (64, 3, 1, 1),
        (128, 3, 1, 1), (128, 3, 1, 1),
        (256, 3, 1, 1), (256, 3, 1, 1), (256, 3, 1, 1),
        (512, 3, 1, 1), (512, 3, 1, 1), (512, 3, 1, 1),
        (512, 3, 1, 1), (512, 3, 1, 1), (512, 3, 1, 1),
    ],
    "pool_before": {2, 4, 7, 10},  # maxpool(2, 2)
    "taps": [1, 3, 6, 9, 12],
}
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def default_weights_dir() -> str:
    return os.environ.get(
        "TENSORF_LPIPS_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "weights"),
    )


def weights_path(net: str) -> str:
    return os.path.join(default_weights_dir(), f"lpips_{net}.npz")


@functools.lru_cache(maxsize=2)
def load_weights(net: str) -> Optional[dict]:
    path = weights_path(net)
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def _forward_taps(arch, weights, x):
    """x: (H, W, 3) in [-1, 1] normalized -> list of tap activations."""
    import jax
    import jax.numpy as jnp

    x = (x - _SHIFT) / _SCALE
    x = x[None]  # NHWC
    taps = []
    pool_ks = 3 if arch is _ALEX else 2
    for i, (out_ch, k, stride, pad) in enumerate(arch["convs"]):
        if i in arch["pool_before"]:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max,
                (1, pool_ks, pool_ks, 1), (1, 2, 2, 1), "VALID",
            )
        w = jnp.asarray(weights[f"conv{i}.w"])  # (k, k, in, out)
        b = jnp.asarray(weights[f"conv{i}.b"])
        x = jax.lax.conv_general_dilated(
            x, w, (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
        x = jax.nn.relu(x)
        if i in arch["taps"]:
            taps.append(x)
    return taps


def _lpips_pair(arch, weights, img0, img1):
    import jax.numpy as jnp

    taps0 = _forward_taps(arch, weights, img0)
    taps1 = _forward_taps(arch, weights, img1)
    total = jnp.float32(0.0)
    for k, (a, b) in enumerate(zip(taps0, taps1)):
        na = a / jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True) + 1e-10)
        nb = b / jnp.sqrt(jnp.sum(b * b, axis=-1, keepdims=True) + 1e-10)
        diff = (na - nb) ** 2
        lin = jnp.asarray(weights[f"lin{k}.w"])  # (C,)
        total = total + jnp.mean(jnp.sum(diff * lin, axis=-1))
    return total


def lpips(np_gt: np.ndarray, np_im: np.ndarray, net: str = "alex") -> Optional[float]:
    """LPIPS distance of two (H, W, 3) images in [0, 1]; None if the
    weight file for ``net`` is absent."""
    weights = load_weights(net)
    if weights is None:
        return None
    import jax
    import jax.numpy as jnp

    arch = _ALEX if net == "alex" else _VGG

    @functools.partial(jax.jit, static_argnums=())
    def run(a, b):
        return _lpips_pair(arch, weights, a, b)

    a = jnp.asarray(np_gt, jnp.float32) * 2.0 - 1.0
    b = jnp.asarray(np_im, jnp.float32) * 2.0 - 1.0
    return float(run(a, b))
