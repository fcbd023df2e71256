"""Paged engine: page accounting across the request lifecycle, decode
parity with the contiguous engine, page-boundary crossing, pool reuse."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_cosine_sim_attention_tpu.models import CosineSimCausalTransformer
from flash_cosine_sim_attention_tpu.serving import (
    InferenceEngine,
    PagedInferenceEngine,
)


@pytest.fixture(scope="module")
def setup():
    model = CosineSimCausalTransformer(
        num_tokens=64, dim=64, depth=2, max_seq_len=512, heads=4,
        dim_head=16, pre_norm=True, attn_scale=1.0, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jax.random.randint(rng, (1, 16), 0, 64))
    return model, params


def _paged(model, params, **kw):
    kw.setdefault("num_slots", 4)
    kw.setdefault("page_size", 128)
    kw.setdefault("num_pages", 32)
    kw.setdefault("max_pages_per_slot", 4)
    kw.setdefault("reserve_tokens", 128)
    kw.setdefault("prompt_buckets", (32, 64, 256))
    return PagedInferenceEngine(model, params, **kw)


def test_paged_matches_contiguous_decode(setup):
    """Prefill logits are bit-exact vs the contiguous path; decode logits
    agree within bf16 tolerance (different summation order, same math —
    token-for-token equality is NOT expected on an untrained model whose
    logit gaps are below the numeric noise)."""
    from flash_cosine_sim_attention_tpu.models.decoding import (
        decode_step,
        decode_step_paged,
        init_decode_state,
        init_paged_decode_state,
        prefill,
        prefill_paged,
    )
    model, params = setup
    prompt = jnp.asarray((np.arange(13) % 64)[None], jnp.int32)

    st = init_decode_state(model, 1, 256)
    lc, st = prefill(model, params, st, prompt)

    pst = init_paged_decode_state(model, 4, 32, 128, 4)
    table = np.zeros((4, 4), np.int32)
    table[0, :2] = [1, 2]
    pst = pst._replace(caches=tuple(
        c._replace(page_table=jnp.asarray(table)) for c in pst.caches))
    lp, pst = prefill_paged(model, params, pst, jnp.int32(0), prompt)
    assert float(jnp.abs(lc - lp).max()) == 0.0

    tok = jnp.argmax(lc, -1).astype(jnp.int32)
    for _ in range(3):
        lc, st = decode_step(model, params, st, tok)
        lp, pst = decode_step_paged(
            model, params, pst,
            jnp.zeros((4,), jnp.int32).at[0].set(tok[0]),
            jnp.asarray([True, False, False, False]))
        assert float(jnp.abs(lc[0] - lp[0]).max()) < 5e-2
        tok = jnp.argmax(lc, -1).astype(jnp.int32)
    assert int(st.pos[0]) == int(pst.pos[0])


def test_page_accounting_lifecycle(setup):
    model, params = setup
    eng = _paged(model, params, seed=3)
    assert eng.pages_in_use() == 0

    s = eng.add_request(np.arange(20) % 64)
    # 20 prompt + 128 reserve -> 2 pages of 128
    assert eng.pages_in_use() == 2
    for _ in range(4):
        eng.step()
    eng.finish(s)
    assert eng.pages_in_use() == 0
    assert len(eng.allocator.free) == 31  # all but the null page


def test_page_boundary_growth(setup):
    """Decoding past the reserved pages must allocate a new page."""
    model, params = setup
    eng = _paged(model, params, reserve_tokens=0, seed=4)
    s = eng.add_request(np.arange(126) % 64)  # 126 -> 1 page of 128
    assert eng.pages_in_use() == 1
    for _ in range(5):  # crosses 128 at the 2nd decode token
        eng.step()
    assert eng.pages_in_use() == 2
    assert int(eng.state.pos[s]) == 126 + 5


def test_interleaved_isolation_and_reuse(setup):
    model, params = setup
    eng = _paged(model, params, temperature=1e-4, seed=42)

    ref_eng = _paged(model, params, temperature=1e-4, seed=42)
    sa0 = ref_eng.add_request(np.arange(9) % 64)
    ref = [int(ref_eng.last_token[sa0])]
    for _ in range(5):
        ref.append(ref_eng.step()[sa0])

    sa = eng.add_request(np.arange(9) % 64)
    got = [int(eng.last_token[sa])]
    got.append(eng.step()[sa])
    sb = eng.add_request((np.arange(17) * 3) % 64)
    for _ in range(4):
        out = eng.step()
        got.append(out[sa])
        assert sb in out
    assert got == ref

    used_before = eng.pages_in_use()
    eng.finish(sb)
    assert eng.pages_in_use() < used_before
    # freed pages get reused by the next request
    sc = eng.add_request(np.arange(5) % 64)
    assert sc == sb


def test_pool_exhaustion(setup):
    model, params = setup
    eng = _paged(model, params, num_pages=4, reserve_tokens=256, seed=5)
    eng.add_request(np.arange(8) % 64)   # 256+8 -> 3 pages (of 3 free)
    with pytest.raises(RuntimeError):
        eng.add_request(np.arange(8) % 64)


def test_paged_continue_request(setup):
    """Multi-turn on the paged engine: continuation allocates pages and
    matches the contiguous engine's continuation flow."""
    model, params = setup
    eng = _paged(model, params, temperature=1e-4, seed=11,
                 reserve_tokens=0)
    s = eng.add_request(np.arange(20) % 64)
    pages0 = eng.pages_in_use()
    for _ in range(3):
        eng.step()
    tok = eng.continue_request(s, (np.arange(150) * 3) % 64)
    assert 0 <= tok < 64
    assert int(eng.state.pos[s]) == 20 + 3 + 150
    assert eng.pages_in_use() > pages0  # chunk forced page growth
    nxt = eng.step()
    assert s in nxt


def test_paged_fp8_cache(setup):
    """Paged pool in e4m3: decode + lifecycle still work."""
    model, params = setup
    eng = _paged(model, params, seed=12, kv_dtype=jnp.float8_e4m3fn)
    s = eng.add_request(np.arange(16) % 64)
    toks = [eng.step()[s] for _ in range(4)]
    assert all(0 <= t < 64 for t in toks)
    eng.finish(s)
    assert eng.pages_in_use() == 0


def test_paged_chunked_prefill_matches_one_shot(setup):
    """Chunked admission on the PAGED engine: same greedy continuation as
    one-shot, decode uninterrupted, page accounting correct."""
    model, params = setup
    pa = np.arange(9) % 64
    pb = (np.arange(40) * 5) % 64

    def mk():
        return PagedInferenceEngine(
            model, params, num_slots=4, page_size=128, num_pages=32,
            max_pages_per_slot=4, reserve_tokens=0,
            prompt_buckets=(16, 32, 64, 128),
            temperature=1e-4, seed=42)

    e = mk()
    s = e.add_request(pb)
    ref_b = [int(e.last_token[s])]
    for _ in range(3):
        ref_b.append(e.step()[s])

    eng = mk()
    sa = eng.add_request(pa)
    got_a = [int(eng.last_token[sa])]
    got_a.append(eng.step()[sa])
    sb = eng.add_request(pb, chunk_tokens=16)
    assert eng.prefilling[sb]
    for _ in range(3):
        out = eng.step()
        got_a.append(out[sa])
        assert sb not in out
    assert eng.active[sb]
    got_b = [int(eng.last_token[sb])]
    for _ in range(3):
        got_b.append(eng.step()[sb])
    assert got_b == ref_b, (got_b, ref_b)
    assert eng.pages_in_use() == sum(
        (int(eng.host_pos[s]) + 127) // 128 for s in (sa, sb))
    eng.finish(sb)
    assert eng.pages_in_use() == 1  # only sa's single page remains
