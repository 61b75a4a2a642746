"""NDC-path training smoke test: the llff/NDC renderer branch end-to-end.

Uses random (non-multi-view-consistent) images — the check is that the
NDC sampling branch (linspace near/far, dist x |d|, normalized viewdirs)
trains with finite losses and renders, not that it converges.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tensorf_tpu.models import FIELD_MODELS, ModelConfig
from tensorf_tpu.train import (
    LossWeights,
    TrainStatics,
    make_optimizer,
    make_train_step,
)
from tensorf_tpu.render.chunked import make_render_fn, render_chunked


def test_ndc_train_and_render(rng):
    cfg = ModelConfig(
        model_name="TensorVMSplit",
        density_n_comp=(2, 2, 2),
        app_n_comp=(2, 2, 2),
        app_dim=6,
        shading_mode="MLP_Fea",
        pos_pe=0,
        view_pe=0,
        fea_pe=0,
        feature_c=16,
        fea2dense_act="relu",  # the llff preset activation
        near_far=(0.0, 1.0),
        density_shift=0.0,
    )
    model = FIELD_MODELS[cfg.model_name]
    params = model.init(jax.random.PRNGKey(0), cfg, (16, 18, 10))
    aabb = jnp.asarray([[-1.5, -1.67, -1.0], [1.5, 1.67, 1.0]])

    # NDC-style rays: origins on the near plane cube, forward +z
    o = rng.uniform(-0.8, 0.8, size=(128, 3)).astype(np.float32)
    o[:, 2] = -0.9
    d = rng.normal(0, 0.05, size=(128, 3)).astype(np.float32)
    d[:, 2] = 1.8
    rays = jnp.asarray(np.concatenate([o, d], -1))
    rgbs = jnp.asarray(rng.uniform(size=(128, 3)).astype(np.float32))

    optimizer, opt_state = make_optimizer(params, 0.02, 1e-3, 1.0)
    statics = TrainStatics(
        n_samples=32,
        step_size=0.05,  # unused on the ndc branch
        white_bg=False,
        ndc_ray=True,
        total_steps=20,
        lr_factor=1.0,
        weights=LossWeights(tv_density=1.0, tv_app=1.0),
    )
    step_fn = make_train_step(model, cfg, statics, optimizer)
    losses = []
    key = jax.random.PRNGKey(3)
    for i in range(10):
        key, sub = jax.random.split(key)
        params, opt_state, metrics = step_fn(
            params, opt_state, None, aabb, rays, rgbs, jnp.asarray(i), sub
        )
        losses.append(float(metrics["mse"]))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] <= losses[0] + 1e-3

    fn = make_render_fn(
        model, cfg, step_size=0.05, n_samples=32,
        white_bg=False, ndc_ray=True,
    )
    rgb, depth, _, _ = render_chunked(
        fn, params, None, np.asarray(rays), aabb, chunk=64
    )
    assert rgb.shape == (128, 3)
    assert np.isfinite(rgb).all() and np.isfinite(depth).all()
