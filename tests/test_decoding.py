"""Cached decode path vs the full forward pass.

The cached path must reproduce the full model's logits (prefill exactly;
decode steps within the stated INT8-cache delta)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_cosine_sim_attention_tpu.models import CosineSimCausalTransformer
from flash_cosine_sim_attention_tpu.models.decoding import (
    decode_step,
    generate_cached,
    init_decode_state,
    prefill,
)

DELTA_LOGITS = 8e-2  # int8 KV cache vs exact history, f32 model


@pytest.fixture(scope="module")
def model_and_params():
    model = CosineSimCausalTransformer(
        num_tokens=64, dim=128, depth=2, max_seq_len=128, heads=4,
        dim_head=32, pre_norm=True, attn_scale=1.0, attn_l2norm_groups=8,
        dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    x = jax.random.randint(rng, (2, 16), 0, 64)
    params = model.init(rng, x)
    return model, params


def test_prefill_matches_full_forward(model_and_params):
    model, params = model_and_params
    rng = jax.random.PRNGKey(1)
    tokens = jax.random.randint(rng, (2, 17), 0, 64)
    full = model.apply(params, tokens)[:, -1]
    state = init_decode_state(model, 2, 64)
    cached, state = prefill(model, params, state, tokens)
    assert int(state.pos[0]) == 17
    assert float(jnp.abs(full - cached).max()) < 2e-4


def test_decode_steps_match_full_forward(model_and_params):
    model, params = model_and_params
    rng = jax.random.PRNGKey(2)
    tokens = np.asarray(jax.random.randint(rng, (2, 10), 0, 64))
    state = init_decode_state(model, 2, 64)
    _, state = prefill(model, params, state, jnp.asarray(tokens[:, :6]))
    for t in range(6, 10):
        cached, state = decode_step(
            model, params, state, jnp.asarray(tokens[:, t]))
        full = model.apply(params, jnp.asarray(tokens[:, :t + 1]))[:, -1]
        diff = float(jnp.abs(full - cached).max())
        assert diff < DELTA_LOGITS, (t, diff)
    assert int(state.pos[0]) == 10


def test_generate_cached_runs_and_jits(model_and_params):
    model, params = model_and_params
    rng = jax.random.PRNGKey(3)
    prime = jax.random.randint(rng, (2, 8), 0, 64)
    out = jax.jit(
        lambda p, r, pr: generate_cached(model, p, r, pr, seq_len=12,
                                         capacity=64)
    )(params, rng, prime)
    assert out.shape == (2, 12)
    assert out.dtype == jnp.int32
    assert int(out.min()) >= 0 and int(out.max()) < 64


def test_greedy_cached_matches_uncached(model_and_params):
    """Greedy argmax continuation should match between the cached decode
    path and repeated full forwards (quantization rarely flips an argmax
    on a random init; allow a small number of divergent steps after the
    first mismatch)."""
    model, params = model_and_params
    rng = jax.random.PRNGKey(4)
    prime = jax.random.randint(rng, (1, 8), 0, 64)

    # uncached greedy
    toks_full = np.asarray(prime)
    for _ in range(8):
        logits = model.apply(params, jnp.asarray(toks_full))[:, -1]
        nxt = np.asarray(jnp.argmax(logits, -1))[:, None]
        toks_full = np.concatenate([toks_full, nxt], axis=1)

    # cached greedy
    state = init_decode_state(model, 1, 64)
    logits, state = prefill(model, params, state, prime)
    toks_cached = [int(jnp.argmax(logits, -1)[0])]
    for _ in range(7):
        logits, state = decode_step(
            model, params, state, jnp.asarray([toks_cached[-1]]))
        toks_cached.append(int(jnp.argmax(logits, -1)[0]))

    full_cont = toks_full[0, 8:].tolist()
    matches = sum(a == b for a, b in zip(full_cont, toks_cached))
    assert matches >= 6, (full_cont, toks_cached)
