"""Pipeline parallelism: GPipe schedule over a ("pipe",) device mesh.

Exactness tests: the pipelined loss and gradients must EQUAL the plain
single-device model's (pipelining reorders compute, it does not
approximate), and a train step must run with the layer stack sharded
over the pipe axis."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from flash_cosine_sim_attention_tpu.models import CosineSimCausalTransformer
from flash_cosine_sim_attention_tpu.parallel.pipeline import (
    make_pipeline_loss_fn,
    make_pipeline_mesh,
    make_pipeline_train_step,
    merge_pipeline_params,
    shard_pipeline_params,
    split_pipeline_params,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _build(depth=4, use_fused=False):
    return CosineSimCausalTransformer(
        num_tokens=64, dim=64, depth=depth, max_seq_len=32, heads=4,
        dim_head=16, pre_norm=True, attn_scale=1.0, use_fused=use_fused,
        dtype=jnp.float32)


def _data(rng, b=4, n=32):
    return jax.random.randint(rng, (b, n + 1), 0, 64)


@pytest.mark.parametrize("n_stages,n_micro", [(4, 2), (2, 4), (1, 2)])
def test_pipeline_loss_matches_plain(n_stages, n_micro):
    model = _build()
    rng = jax.random.PRNGKey(0)
    tokens = _data(rng)
    params = model.init(rng, tokens, return_loss=True)
    loss_plain = model.apply(params, tokens, return_loss=True)

    mesh = make_pipeline_mesh(n_stages)
    stacked, aux = split_pipeline_params(model, params, n_stages)
    loss_fn = make_pipeline_loss_fn(model, mesh, n_micro)
    loss_pipe = loss_fn(stacked, aux, tokens)
    # microbatch means reassociate the reduction: allow rounding
    assert abs(float(loss_pipe) - float(loss_plain)) < 5e-6


@pytest.mark.parametrize("remat", [False, True])
def test_pipeline_grads_match_plain(remat):
    model = _build()
    rng = jax.random.PRNGKey(1)
    tokens = _data(rng)
    params = model.init(rng, tokens, return_loss=True)

    g_plain = jax.grad(
        lambda p: model.apply(p, tokens, return_loss=True))(params)

    mesh = make_pipeline_mesh(4)
    stacked, aux = split_pipeline_params(model, params, 4)
    loss_fn = make_pipeline_loss_fn(model, mesh, n_micro=2, remat=remat)
    gs, ga = jax.grad(lambda s, a: loss_fn(s, a, tokens),
                      argnums=(0, 1))(stacked, aux)
    g_pipe = merge_pipeline_params(model, gs, ga)

    flat_a = jax.tree.leaves(g_plain)
    flat_b = jax.tree.leaves(
        {"params": {k: g_pipe["params"][k]
                    for k in params["params"].keys()}})
    # align by re-keying: tree.map over the matched structures
    diffs = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), g_plain, g_pipe)
    assert max(jax.tree.leaves(diffs)) < 5e-6, diffs
    assert len(flat_a) == len(flat_b)


def test_pipeline_train_step_sharded():
    model = _build()
    rng = jax.random.PRNGKey(2)
    tokens = _data(rng)
    params = model.init(rng, tokens, return_loss=True)

    mesh = make_pipeline_mesh(4)
    stacked, aux = split_pipeline_params(model, params, 4)
    stacked, aux = shard_pipeline_params(stacked, aux, mesh)
    tx = optax.adam(1e-3)
    opt_state = tx.init((stacked, aux))
    step = make_pipeline_train_step(model, tx, mesh, n_micro=2)

    (stacked2, aux2), opt_state, loss = step(
        (stacked, aux), opt_state, tokens)
    assert np.isfinite(float(loss))
    # the layer stack stayed sharded over pipe
    leaf = jax.tree.leaves(stacked2)[0]
    assert "pipe" in str(leaf.sharding.spec)
    # and params moved
    moved = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         stacked, stacked2)
    assert max(jax.tree.leaves(moved)) > 0

    # round-trip: merged params still drive the plain model
    merged = merge_pipeline_params(
        model, jax.device_get(stacked2), jax.device_get(aux2))
    l2 = model.apply(merged, tokens, return_loss=True)
    assert np.isfinite(float(l2))


def test_pipeline_composes_with_data_parallel():
    """(data=2, pipe=4) 2-D mesh: each replica pipelines its own batch
    shard; loss (and therefore grads) still equal the plain model."""
    model = _build()
    rng = jax.random.PRNGKey(4)
    tokens = _data(rng, b=8)
    params = model.init(rng, tokens, return_loss=True)
    loss_plain = model.apply(params, tokens, return_loss=True)

    mesh = make_pipeline_mesh(8, pipeline_parallel=4)
    assert mesh.shape == {"data": 2, "pipe": 4}
    stacked, aux = split_pipeline_params(model, params, 4)
    loss_fn = make_pipeline_loss_fn(model, mesh, n_micro=2)
    loss_pipe = loss_fn(stacked, aux, tokens)
    # microbatch/shard means reassociate the reduction: allow rounding
    assert abs(float(loss_pipe) - float(loss_plain)) < 5e-6


def test_pipeline_with_fused_kernels():
    """The fused Pallas attention path composes with the pipeline."""
    model = _build(depth=2, use_fused=True)
    rng = jax.random.PRNGKey(3)
    tokens = _data(rng, b=2)
    params = model.init(rng, tokens, return_loss=True)
    loss_plain = model.apply(params, tokens, return_loss=True)

    mesh = make_pipeline_mesh(2)
    stacked, aux = split_pipeline_params(model, params, 2)
    loss_fn = make_pipeline_loss_fn(model, mesh, n_micro=2)
    loss_pipe = loss_fn(stacked, aux, tokens)
    # microbatch means reassociate the reduction: allow rounding
    assert abs(float(loss_pipe) - float(loss_plain)) < 5e-6
