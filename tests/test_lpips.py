"""LPIPS-in-JAX structural tests (real calibration weights are vendored
separately via scripts/convert_lpips_weights.py; here random weights check
the architecture plumbing and the metric axioms)."""

import importlib

import numpy as np
import pytest


def _write_random_weights(path, net):
    from tensorf_tpu.eval import lpips_jax

    arch = lpips_jax._ALEX if net == "alex" else lpips_jax._VGG
    rng = np.random.default_rng(0)
    out = {}
    in_ch = 3
    for i, (out_ch, k, stride, pad) in enumerate(arch["convs"]):
        out[f"conv{i}.w"] = (
            rng.standard_normal((k, k, in_ch, out_ch)).astype(np.float32)
            * np.sqrt(2.0 / (k * k * in_ch))
        )
        out[f"conv{i}.b"] = np.zeros(out_ch, np.float32)
        in_ch = out_ch
    for t, ci in enumerate(arch["taps"]):
        c = arch["convs"][ci][0]
        out[f"lin{t}.w"] = rng.uniform(0, 1, size=c).astype(np.float32)
    np.savez(path, **out)


@pytest.mark.parametrize("net", ["alex", "vgg"])
def test_lpips_jax_axioms(tmp_path, monkeypatch, net):
    monkeypatch.setenv("TENSORF_LPIPS_DIR", str(tmp_path))
    from tensorf_tpu.eval import lpips_jax

    lpips_jax.load_weights.cache_clear()
    _write_random_weights(tmp_path / f"lpips_{net}.npz", net)

    rng = np.random.default_rng(1)
    a = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    b = rng.uniform(size=(64, 64, 3)).astype(np.float32)

    d_ab = lpips_jax.lpips(a, b, net=net)
    d_aa = lpips_jax.lpips(a, a, net=net)
    assert d_ab is not None and np.isfinite(d_ab)
    assert d_ab > 0.0
    assert abs(d_aa) < 1e-6  # identity of indiscernibles
    # symmetry
    d_ba = lpips_jax.lpips(b, a, net=net)
    np.testing.assert_allclose(d_ab, d_ba, rtol=1e-4)
    lpips_jax.load_weights.cache_clear()


def test_lpips_absent_weights_returns_none(tmp_path, monkeypatch):
    monkeypatch.setenv("TENSORF_LPIPS_DIR", str(tmp_path / "nope"))
    from tensorf_tpu.eval import lpips_jax

    lpips_jax.load_weights.cache_clear()
    a = np.zeros((16, 16, 3), np.float32)
    assert lpips_jax.lpips(a, a, net="alex") is None
    lpips_jax.load_weights.cache_clear()
