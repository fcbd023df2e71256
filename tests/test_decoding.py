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


# ---------------------------------------------------------------------------
# continuation prefill (multi-turn)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def _cont_setup():
    model = CosineSimCausalTransformer(
        num_tokens=64, dim=64, depth=2, max_seq_len=128, heads=4,
        dim_head=16, pre_norm=True, attn_scale=1.0, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jax.random.randint(rng, (1, 16), 0, 64))
    return model, params


@pytest.mark.parametrize("pad_to", [None, 48])
def test_prefill_continue_matches_full_prefill(_cont_setup, pad_to):
    """Prefilling [A] then continuing with [B] must match prefilling
    [A;B] from scratch, up to the int8 quantization of A's cached K/V."""
    from flash_cosine_sim_attention_tpu.models.decoding import (
        prefill_continue,
    )
    model, params = _cont_setup
    rng = jax.random.PRNGKey(1)
    a = jax.random.randint(rng, (1, 37), 0, 64)
    b = jax.random.randint(jax.random.PRNGKey(2), (1, 23), 0, 64)

    st_full = init_decode_state(model, 1, 128)
    full, st_full = prefill(model, params, st_full,
                            jnp.concatenate([a, b], axis=1))

    # 2-slot state, both prefilled with A (prefill is whole-batch);
    # then ONLY slot 0 continues with B
    st = init_decode_state(model, 2, 128)
    _, st = prefill(model, params, st, jnp.tile(a, (2, 1)))
    if pad_to is None:
        chunk, tl = b, None
    else:
        chunk = jnp.zeros((1, pad_to), jnp.int32).at[:, :23].set(b)
        tl = jnp.asarray([23], jnp.int32)
    cont, st = prefill_continue(model, params, st, jnp.int32(0), chunk,
                                true_len=tl)

    # tolerance: the continuation reads A through the int8 cache
    assert float(jnp.abs(full - cont).max()) < DELTA_LOGITS
    assert int(st.pos[0]) == 60
    assert int(st.caches[0].length[0]) == 60
    # the slot that did NOT continue is untouched
    assert int(st.caches[0].length[1]) == 37


def test_engine_continue_request(_cont_setup):
    from flash_cosine_sim_attention_tpu.serving import InferenceEngine
    model, params = _cont_setup
    eng = InferenceEngine(model, params, num_slots=2, capacity=128,
                          prompt_buckets=(32, 64), temperature=1e-4,
                          seed=9)
    s = eng.add_request(np.arange(10) % 64)
    for _ in range(3):
        eng.step()
    pos_before = int(eng.state.pos[s])
    tok = eng.continue_request(s, (np.arange(12) * 5) % 64)
    assert 0 <= tok < 64
    assert int(eng.state.pos[s]) == pos_before + 12
    nxt = eng.step()  # decoding resumes after the continuation
    assert s in nxt


def test_gqa_model_cached_decode_matches_full_forward():
    """GQA transformer (kv_heads < heads): the cached INT8 decode path
    greedily matches the full re-forward within quantization tolerance,
    and the caches allocate only kv_heads rows."""
    model = CosineSimCausalTransformer(
        num_tokens=64, dim=64, depth=2, max_seq_len=128, heads=8,
        kv_heads=2, dim_head=8, pre_norm=True, attn_scale=1.0,
        dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    prime = jax.random.randint(rng, (1, 12), 0, 64)
    params = model.init(rng, prime)

    st = init_decode_state(model, 1, 64)
    assert st.caches[0].k8.shape[1] == 2  # kv_heads rows, not heads
    logits, st = prefill(model, params, st, prime)
    cached = [np.asarray(logits[0])]
    toks = [int(jnp.argmax(logits, -1)[0])]
    for _ in range(8):
        logits, st = decode_step(
            model, params, st, jnp.asarray([toks[-1]], jnp.int32))
        cached.append(np.asarray(logits[0]))
        toks.append(int(jnp.argmax(logits, -1)[0]))

    # full re-forward logits on the same token sequence (tolerance: the
    # cached path attends an INT8-quantized history)
    seq = jnp.concatenate([prime, jnp.asarray([toks[:-1]], jnp.int32)], 1)
    for i in range(9):
        out = model.apply(params, seq[:, : prime.shape[1] + i])
        ref = np.asarray(out[0, -1])
        np.testing.assert_allclose(cached[i], ref, atol=0.05)


def test_fused_qkv_params_match_unfused():
    """fuse_qkv_params: one concatenated to_qkv matmul per layer must
    reproduce the separate to_q/to_k/to_v projections through prefill and
    decode steps — plain, quantized, and GQA trees."""
    from flash_cosine_sim_attention_tpu.models.decoding import (
        fuse_qkv_params,
    )
    from flash_cosine_sim_attention_tpu.quant.weights import quantize_params

    for kvh in (None, 2):
        model = CosineSimCausalTransformer(
            num_tokens=64, dim=64, depth=2, max_seq_len=128, heads=4,
            kv_heads=kvh, dim_head=16, pre_norm=True, attn_scale=1.0,
            dtype=jnp.float32)
        rng = jax.random.PRNGKey(0)
        prime = jax.random.randint(rng, (2, 12), 0, 64)
        params = model.init(rng, prime)

        for quant in (False, True):
            base = quantize_params(params) if quant else params
            fused = fuse_qkv_params(base)
            lp = fused["params"]["attn_0"]
            assert "to_qkv" in lp and "to_q" not in lp
            key = "kernel_q" if quant else "kernel"
            assert lp["to_qkv"][key].shape == (64, (4 + 2 * (kvh or 4)) * 16)

            st_a = init_decode_state(model, 2, 64)
            st_b = init_decode_state(model, 2, 64)
            la, st_a = prefill(model, base, st_a, prime)
            lb, st_b = prefill(model, fused, st_b, prime)
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       atol=1e-5)
            tok = jnp.argmax(la, -1)
            for _ in range(3):
                la, st_a = decode_step(model, base, st_a, tok)
                lb, st_b = decode_step(model, fused, st_b, tok)
                np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                           atol=1e-5)
                tok = jnp.argmax(la, -1)
