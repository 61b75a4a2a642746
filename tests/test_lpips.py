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
            rng.standard_normal((k, k, in_ch, out_ch))
            * np.sqrt(2.0 / (k * k * in_ch))
        ).astype(np.float32)
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


def _torch_lpips_mirror(weights, net, img0, img1):
    """The official LPIPS computation (lpips package v0.1 semantics:
    ScalingLayer -> backbone taps -> normalize_tensor -> squared diff ->
    1x1 lin conv -> spatial average -> sum over taps), built in torch
    from the SAME weight arrays our JAX stack loads.  Mirrors
    torchvision alexnet/vgg16 `.features` layer order exactly
    (reference surface: /root/reference/loss.py:144-159)."""
    import torch
    import torch.nn.functional as F

    from tensorf_tpu.eval import lpips_jax

    arch = lpips_jax._ALEX if net == "alex" else lpips_jax._VGG
    pool_ks = 3 if net == "alex" else 2

    shift = torch.tensor(lpips_jax._SHIFT).view(1, 3, 1, 1)
    scale = torch.tensor(lpips_jax._SCALE).view(1, 3, 1, 1)

    def taps_of(img):
        # (H, W, 3) in [0,1] -> NCHW in [-1,1] -> scaling layer
        x = torch.from_numpy(np.ascontiguousarray(img)).permute(2, 0, 1)[None]
        x = x * 2.0 - 1.0
        x = (x - shift) / scale
        taps = []
        for i, (out_ch, k, stride, pad) in enumerate(arch["convs"]):
            if i in arch["pool_before"]:
                x = F.max_pool2d(x, pool_ks, stride=2)
            w = torch.from_numpy(weights[f"conv{i}.w"]).permute(3, 2, 0, 1)
            b = torch.from_numpy(weights[f"conv{i}.b"])
            x = F.conv2d(x, w, b, stride=stride, padding=pad)
            x = F.relu(x)
            if i in arch["taps"]:
                taps.append(x)
        return taps

    t0, t1 = taps_of(img0), taps_of(img1)
    total = 0.0
    for kk, (a, b) in enumerate(zip(t0, t1)):
        # lpips.normalize_tensor: x / (sqrt(sum_c x^2) + 1e-10)
        na = a / (torch.sqrt(torch.sum(a * a, dim=1, keepdim=True)) + 1e-10)
        nb = b / (torch.sqrt(torch.sum(b * b, dim=1, keepdim=True)) + 1e-10)
        diff = (na - nb) ** 2
        lin = torch.from_numpy(weights[f"lin{kk}.w"]).view(1, -1, 1, 1)
        total += float(torch.mean(torch.sum(diff * lin, dim=1)))
    return total


@pytest.mark.parametrize("net", ["alex", "vgg"])
def test_lpips_jax_matches_torch_reference_computation(
    tmp_path, monkeypatch, net
):
    """Numerical parity of the full JAX LPIPS stack against a torch-built
    official-semantics forward with identical random weights (VERDICT r2
    #6: the axiom tests alone would pass for many wrong-but-symmetric
    implementations — this pins taps, pooling, padding, and the distance
    head)."""
    pytest.importorskip("torch")
    monkeypatch.setenv("TENSORF_LPIPS_DIR", str(tmp_path))
    from tensorf_tpu.eval import lpips_jax

    lpips_jax.load_weights.cache_clear()
    _write_random_weights(tmp_path / f"lpips_{net}.npz", net)
    weights = dict(np.load(tmp_path / f"lpips_{net}.npz"))

    rng = np.random.default_rng(2)
    # non-square to catch any H/W transposition
    a = rng.uniform(size=(72, 64, 3)).astype(np.float32)
    b = np.clip(a + 0.1 * rng.standard_normal(a.shape), 0, 1).astype(
        np.float32
    )

    ours = lpips_jax.lpips(a, b, net=net)
    ref = _torch_lpips_mirror(weights, net, a, b)
    assert ours is not None
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=1e-6)
    lpips_jax.load_weights.cache_clear()


def test_lpips_absent_weights_returns_none(tmp_path, monkeypatch):
    monkeypatch.setenv("TENSORF_LPIPS_DIR", str(tmp_path / "nope"))
    from tensorf_tpu.eval import lpips_jax

    lpips_jax.load_weights.cache_clear()
    a = np.zeros((16, 16, 3), np.float32)
    assert lpips_jax.lpips(a, a, net="alex") is None
    lpips_jax.load_weights.cache_clear()
