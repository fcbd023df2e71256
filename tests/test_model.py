"""Model-layer tests: transformer semantics, DeepNet init/scaling,
attention-fn selection, generation, and a tiny overfit sanity check
(the reference validates these only implicitly through train.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from flash_cosine_sim_attention_tpu.models import (
    CosineSimCausalTransformer,
    generate,
)


def _model(**kw):
    cfg = dict(num_tokens=64, dim=64, depth=2, max_seq_len=64, heads=4,
               dim_head=16, pre_norm=True, attn_scale=1.0,
               dtype=jnp.float32)
    cfg.update(kw)
    return CosineSimCausalTransformer(**cfg)


def test_forward_shape_and_loss():
    m = _model()
    rng = jax.random.PRNGKey(0)
    x = jax.random.randint(rng, (2, 33), 0, 64)
    params = m.init(rng, x[:, :-1])
    logits = m.apply(params, x[:, :-1])
    assert logits.shape == (2, 32, 64)

    loss = m.apply(params, x, return_loss=True)
    # manual shifted cross-entropy must agree
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
    manual = -jnp.take_along_axis(logp, x[:, 1:, None], axis=-1).mean()
    assert abs(float(loss) - float(manual)) < 1e-6


def test_deepnet_scaling_post_norm():
    # post-norm: residual scale (2*depth)^0.25 (ref transformer.py:132)
    m = _model(pre_norm=False, depth=8)
    assert abs(m.residual_scale - (16) ** 0.25) < 1e-9
    assert _model(pre_norm=True).residual_scale == 1.0


def test_post_norm_variant_runs():
    m = _model(pre_norm=False)
    rng = jax.random.PRNGKey(1)
    x = jax.random.randint(rng, (1, 17), 0, 64)
    params = m.init(rng, x, return_loss=True)
    loss = m.apply(params, x, return_loss=True)
    assert jnp.isfinite(loss)
    # post-norm adds per-block norms
    names = set(params["params"].keys())
    assert "attn_norm_0" in names and "ff_norm_1" in names


def test_attn_fn_selection_fused_matches_plain():
    """use_fused toggles the kernel vs the einsum oracle inside the model;
    both must produce the same network output."""
    rng = jax.random.PRNGKey(2)
    x = jax.random.randint(rng, (2, 31), 0, 64)
    m_fused = _model(use_fused=True)
    m_plain = _model(use_fused=False)
    params = m_fused.init(rng, x)
    lo_f = m_fused.apply(params, x)
    lo_p = m_plain.apply(params, x)
    assert float(jnp.abs(lo_f - lo_p).max()) < 1e-4


def test_non_cosine_baseline_differs():
    # the vanilla-softmax A/B baseline is a different function
    rng = jax.random.PRNGKey(3)
    x = jax.random.randint(rng, (1, 16), 0, 64)
    m_cos = _model()
    m_van = _model(non_cosine_sim_attn=True)
    params = m_cos.init(rng, x)
    assert float(jnp.abs(m_cos.apply(params, x)
                         - m_van.apply(params, x)).max()) > 1e-3


def test_generate_shapes_and_range():
    m = _model()
    rng = jax.random.PRNGKey(4)
    prime = jax.random.randint(rng, (2, 8), 0, 64)
    params = m.init(rng, prime)
    out = generate(m, params, rng, prime, seq_len=20)
    assert out.shape == (2, 20)
    assert out.dtype == jnp.int32
    assert bool((out >= 0).all()) and bool((out < 64).all())


def test_generate_beyond_window():
    # generation longer than max_seq_len slides the context window
    m = _model(max_seq_len=32)
    rng = jax.random.PRNGKey(5)
    prime = jax.random.randint(rng, (1, 8), 0, 64)
    params = m.init(rng, prime)
    out = generate(m, params, rng, prime, seq_len=40)
    assert out.shape == (1, 40)


def test_tiny_overfit():
    """Loss must drop fast when memorizing one batch — the end-to-end
    learning sanity check (stand-in for the enwik8 run)."""
    m = _model(attn_l2norm_groups=4)
    rng = jax.random.PRNGKey(6)
    x = jax.random.randint(rng, (4, 33), 0, 64)
    params = m.init(rng, x, return_loss=True)
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        loss, g = jax.value_and_grad(
            lambda p: m.apply(p, x, return_loss=True))(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, loss

    params, opt, loss0 = step(params, opt)
    for _ in range(60):
        params, opt, loss = step(params, opt)
    assert float(loss) < 0.5 * float(loss0), (float(loss0), float(loss))
