"""Train-step tests: loss decreases on an overfit target, LR schedule
matches the reference's per-step decay, FreeNeRF masks thread through."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tensorf_tpu.models import FIELD_MODELS, ModelConfig
from tensorf_tpu.train import (
    LossWeights,
    SimpleSampler,
    TrainStatics,
    make_optimizer,
    make_train_step,
)

CFG = ModelConfig(
    model_name="TensorVMSplit",
    density_n_comp=(4, 4, 4),
    app_n_comp=(6, 6, 6),
    app_dim=9,
    shading_mode="MLP_Fea",
    pos_pe=2,
    view_pe=2,
    fea_pe=2,
    feature_c=32,
    density_shift=-3.0,
)
GRID = (16, 16, 16)
AABB = jnp.asarray([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]])


def _rays(rng, n):
    o = rng.normal(size=(n, 3))
    o = 4.0 * o / np.linalg.norm(o, axis=-1, keepdims=True)
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)
    return np.concatenate([o, d], -1).astype(np.float32)


def test_train_step_reduces_loss(rng):
    model = FIELD_MODELS[CFG.model_name]
    params = model.init(jax.random.PRNGKey(0), CFG, GRID)
    optimizer, opt_state = make_optimizer(params, 0.02, 1e-3, 1.0)
    statics = TrainStatics(
        n_samples=64,
        step_size=0.08,
        white_bg=True,
        ndc_ray=False,
        total_steps=100,
        lr_factor=1.0,
        weights=LossWeights(l1=8e-5, tv_density=0.01, tv_app=0.01, ortho=0.01),
    )
    step_fn = make_train_step(model, CFG, statics, optimizer)

    rays = jnp.asarray(_rays(rng, 256))
    rgbs = jnp.asarray(
        rng.uniform(0.2, 0.8, size=(256, 3)).astype(np.float32)
    )

    losses = []
    key = jax.random.PRNGKey(42)
    for i in range(30):
        key, sub = jax.random.split(key)
        params, opt_state, metrics = step_fn(
            params, opt_state, None, AABB, rays, rgbs, jnp.asarray(i), sub
        )
        losses.append(float(metrics["mse"]))
    # random per-ray targets aren't fully fittable; require a steady descent
    assert losses[-1] < losses[0] * 0.97, losses
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses


def test_free_reg_masks_active(rng):
    model = FIELD_MODELS[CFG.model_name]
    params = model.init(jax.random.PRNGKey(0), CFG, GRID)
    optimizer, opt_state = make_optimizer(params)
    statics = TrainStatics(
        n_samples=32,
        step_size=0.1,
        white_bg=True,
        ndc_ray=False,
        total_steps=100,
        lr_factor=0.999,
        weights=LossWeights(
            occ=0.1, occ_range=8, occ_wb_range=8, occ_wb_prior=True
        ),
        free_reg=True,
        free_decomp=True,
        freq_reg_ratio=0.8,
    )
    step_fn = make_train_step(model, CFG, statics, optimizer)
    rays = jnp.asarray(_rays(rng, 64))
    rgbs = jnp.asarray(rng.uniform(size=(64, 3)).astype(np.float32))
    params, opt_state, metrics = step_fn(
        params, opt_state, None, AABB, rays, rgbs, jnp.asarray(0),
        jax.random.PRNGKey(0),
    )
    assert np.isfinite(float(metrics["total_loss"]))
    assert "reg_occ" in metrics


def test_lr_schedule_matches_reference_decay():
    """optax schedule == torch 'lr *= factor each step' semantics."""
    lr0, factor = 0.02, 0.1 ** (1 / 1000)
    params = {"plane_x": jnp.ones((4, 4))}  # labeled spatial
    optimizer, opt_state = make_optimizer(params, lr0, 1e-3, factor)

    # extract schedule scale at a few counts via a dummy constant gradient
    g = {"plane_x": jnp.ones((4, 4))}
    p = params
    applied = []
    for _ in range(3):
        updates, opt_state = optimizer.update(g, opt_state, p)
        applied.append(float(-updates["plane_x"][0, 0]))
        p = optax.apply_updates(p, updates)
    # Adam with constant grads gives |update| = lr (mhat/sqrt(vhat)≈1 after
    # bias correction); ratio between consecutive steps ≈ decay factor
    assert np.isclose(applied[1] / applied[0], factor, rtol=1e-2)
    assert np.isclose(applied[2] / applied[1], factor, rtol=1e-2)


def test_simple_sampler_covers_all():
    s = SimpleSampler(100, 32)
    seen = set()
    for _ in range(10):
        ids = s.nextids()
        assert len(ids) == 32
        seen.update(ids.tolist())
    assert len(seen) > 90
