"""Continuous-batching engine tests: slot lifecycle, interleaved requests,
bucketed prefill exactness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_cosine_sim_attention_tpu.models import CosineSimCausalTransformer
from flash_cosine_sim_attention_tpu.models.decoding import (
    decode_step,
    init_decode_state,
    prefill,
)
from flash_cosine_sim_attention_tpu.serving import InferenceEngine


@pytest.fixture(scope="module")
def setup():
    model = CosineSimCausalTransformer(
        num_tokens=64, dim=64, depth=2, max_seq_len=256, heads=4,
        dim_head=16, pre_norm=True, attn_scale=1.0, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jax.random.randint(rng, (1, 16), 0, 64))
    return model, params


def test_bucketed_prefill_exact(setup):
    """Right-padded prefill must produce the SAME last-token logits as an
    unpadded prefill (causality guarantees it)."""
    model, params = setup
    rng = jax.random.PRNGKey(1)
    n = 11
    prompt = jax.random.randint(rng, (1, n), 0, 64)
    st = init_decode_state(model, 1, 64)
    exact, st_exact = prefill(model, params, st, prompt)

    padded = jnp.zeros((1, 32), jnp.int32).at[:, :n].set(prompt)
    st = init_decode_state(model, 1, 64)
    bucketed, st_b = prefill(model, params, st, padded,
                             true_len=jnp.asarray([n], jnp.int32))
    assert float(jnp.abs(exact - bucketed).max()) < 1e-5
    assert int(st_b.pos[0]) == n


def test_engine_single_request(setup):
    model, params = setup
    eng = InferenceEngine(model, params, num_slots=4, capacity=256,
                          prompt_buckets=(32, 64), seed=0)
    prompt = np.arange(10) % 64
    toks = eng.generate(prompt, max_tokens=8)
    assert len(toks) == 8
    assert all(0 <= t < 64 for t in toks)
    assert eng.free_slots() == [0, 1, 2, 3]


def test_engine_interleaved_requests(setup):
    """Continuous batching: a request added mid-stream must not disturb an
    in-flight request (greedy-matched against a solo run)."""
    model, params = setup
    pa = np.arange(9) % 64
    pb = (np.arange(17) * 3) % 64

    def solo(prompt, steps):
        e = InferenceEngine(model, params, num_slots=4, capacity=256,
                            prompt_buckets=(32, 64),
                            temperature=1e-4, seed=42)
        s = e.add_request(prompt)
        toks = [int(e.last_token[s])]
        for _ in range(steps - 1):
            toks.append(e.step()[s])
        return toks

    ref_a = solo(pa, 6)

    eng = InferenceEngine(model, params, num_slots=4, capacity=256,
                          prompt_buckets=(32, 64),
                          temperature=1e-4, seed=42)
    sa = eng.add_request(pa)
    got_a = [int(eng.last_token[sa])]
    got_a.append(eng.step()[sa])
    got_a.append(eng.step()[sa])
    sb = eng.add_request(pb)          # lands mid-stream in another slot
    assert sb != sa
    for _ in range(3):
        out = eng.step()
        got_a.append(out[sa])
        assert sb in out
    # near-greedy sampling: in-flight request unaffected by the new one
    assert got_a == ref_a

    eng.finish(sa)
    assert sa in eng.free_slots()
    # slot reuse: a third request takes the freed slot
    sc = eng.add_request(pa)
    assert sc == sa


def test_engine_slot_exhaustion(setup):
    model, params = setup
    eng = InferenceEngine(model, params, num_slots=2, capacity=256,
                          prompt_buckets=(32,), seed=1)
    eng.add_request(np.arange(4))
    eng.add_request(np.arange(4))
    with pytest.raises(RuntimeError):
        eng.add_request(np.arange(4))


def test_capacity_guard(setup):
    """A slot at cache capacity must refuse to decode (the append would
    silently clamp-overwrite the newest entry otherwise)."""
    model, params = setup
    eng = InferenceEngine(model, params, num_slots=1, capacity=36,
                          prompt_buckets=(32,), seed=2)
    eng.add_request(np.arange(30))
    for _ in range(6):  # 30 prefill + 6 decode = 36 = capacity
        eng.step()
    with pytest.raises(RuntimeError, match="capacity"):
        eng.step()


def test_prompt_too_long_rejected(setup):
    model, params = setup
    eng = InferenceEngine(model, params, num_slots=2, capacity=256,
                          prompt_buckets=(32,), seed=1)
    with pytest.raises(ValueError):
        eng.add_request(np.arange(100))


def test_continue_padded_width_guard(setup):
    """Regression (ADVICE r1): continue_request must guard on the BUCKET-
    PADDED chunk width, not the raw token count — the padded append would
    otherwise clamp its write start and shift the chunk over history."""
    model, params = setup
    eng = InferenceEngine(model, params, num_slots=1, capacity=160,
                          prompt_buckets=(32, 128), seed=3)
    eng.add_request(np.arange(100) % 64)          # pos = 100
    # n=50 fits raw (100+50 <= 160) but buckets to 128: 100+128 > 160
    with pytest.raises(RuntimeError, match="capacity"):
        eng.continue_request(0, np.arange(50) % 64)


def test_chunked_prefill_matches_one_shot(setup):
    """Chunked admission (prompt streamed in chunks interleaved with decode
    steps) must produce the same greedy continuation as one-shot prefill,
    and must not disturb an in-flight request."""
    model, params = setup
    pa = np.arange(9) % 64
    pb = (np.arange(40) * 5) % 64   # 3 chunks of 16

    def solo(prompt, steps):
        e = InferenceEngine(model, params, num_slots=4, capacity=256,
                            prompt_buckets=(16, 32, 64),
                            temperature=1e-4, seed=42)
        s = e.add_request(prompt)
        toks = [int(e.last_token[s])]
        for _ in range(steps - 1):
            toks.append(e.step()[s])
        return toks

    ref_b = solo(pb, 4)
    ref_a = solo(pa, 9)

    eng = InferenceEngine(model, params, num_slots=4, capacity=256,
                          prompt_buckets=(16, 32, 64),
                          temperature=1e-4, seed=42)
    sa = eng.add_request(pa)
    got_a = [int(eng.last_token[sa])]
    got_a.append(eng.step()[sa])

    sb = eng.add_request(pb, chunk_tokens=16)   # 3 pending chunks
    assert eng.prefilling[sb] and not eng.active[sb]
    # decode keeps running while the prompt streams in
    for _ in range(3):
        out = eng.step()
        got_a.append(out[sa])
        assert sb not in out
    assert eng.active[sb] and not eng.prefilling[sb]
    got_b = [int(eng.last_token[sb])]
    for _ in range(3):
        out = eng.step()
        got_a.append(out[sa])
        got_b.append(out[sb])
    assert got_b == ref_b, (got_b, ref_b)
    assert got_a == ref_a[:len(got_a)], (got_a, ref_a)


def test_engine_with_gqa_model():
    """Engines serve a grouped-query model: kv_heads-row caches, decode
    and chunked admission functional."""
    model = CosineSimCausalTransformer(
        num_tokens=64, dim=64, depth=2, max_seq_len=256, heads=8,
        kv_heads=2, dim_head=8, pre_norm=True, attn_scale=1.0,
        dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jax.random.randint(rng, (1, 16), 0, 64))
    eng = InferenceEngine(model, params, num_slots=2, capacity=128,
                          prompt_buckets=(16, 32), seed=0)
    assert eng.state.caches[0].k8.shape[1] == 2
    s = eng.add_request(np.arange(10) % 64)
    for _ in range(3):
        out = eng.step()
        assert 0 <= out[s] < 64
    s2 = eng.add_request(np.arange(20) % 64, chunk_tokens=16)
    while not eng.active[s2]:
        eng.step()
    assert 0 <= int(eng.last_token[s2]) < 64


def test_step_many_matches_step(setup):
    """step_many(n) must produce exactly the token streams of n step()
    calls (same rng-split pattern), in one device dispatch."""
    model, params = setup
    prompt = np.arange(10) % 64

    e1 = InferenceEngine(model, params, num_slots=2, capacity=128,
                         prompt_buckets=(32,), temperature=1e-4, seed=11)
    s1 = e1.add_request(prompt)
    ref = [e1.step()[s1] for _ in range(4)]

    e2 = InferenceEngine(model, params, num_slots=2, capacity=128,
                         prompt_buckets=(32,), temperature=1e-4, seed=11)
    s2 = e2.add_request(prompt)
    got = e2.step_many(4)[s2]
    assert got == ref, (got, ref)
    assert int(e2.host_pos[s2]) == int(e1.host_pos[s1])
    # streams continue identically afterwards
    assert e2.step()[s2] == e1.step()[s1]


def test_step_many_capacity_guard(setup):
    model, params = setup
    eng = InferenceEngine(model, params, num_slots=1, capacity=36,
                          prompt_buckets=(32,), seed=2)
    eng.add_request(np.arange(30))
    with pytest.raises(RuntimeError, match="capacity"):
        eng.step_many(10)
    assert len(eng.step_many(6)[0]) == 6  # exactly to capacity is fine
