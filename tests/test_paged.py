"""Paged KV cache: pool/table bookkeeping + decode parity vs the
contiguous quantized cache (same tokens, same math, different layout)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_cosine_sim_attention_tpu import l2norm_tensors
from flash_cosine_sim_attention_tpu.quant import (
    PageAllocator,
    append,
    append_paged,
    init_cache,
    init_paged_cache,
    paged_decode_attention,
    quantized_decode_attention,
)


def _setup(rng, b, kvh, n, d, ps=128, t_steps=None):
    """Fill a contiguous cache and an equivalent paged cache with the
    same tokens; returns (contiguous, paged)."""
    max_pages = (n + ps - 1) // ps + 1
    num_pages = b * max_pages + 8
    alloc = PageAllocator(num_pages)

    cont = init_cache(b, kvh, ((n + ps - 1) // ps) * ps, d)
    paged = init_paged_cache(num_pages, kvh, ps, d, b, max_pages)

    # pre-allocate each slot's pages and write the table
    table = np.zeros((b, max_pages), np.int32)
    for s in range(b):
        pages = alloc.alloc(max_pages)
        table[s, :] = pages
    paged = paged._replace(page_table=jnp.asarray(table))

    k = jnp.asarray(rng.standard_normal((b, kvh, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, kvh, n, d)), jnp.float32)
    kn = l2norm_tensors(k)

    if t_steps:  # append in chunks to exercise offset bookkeeping
        start = 0
        for t in t_steps:
            cont = append(cont, kn[:, :, start:start + t],
                          v[:, :, start:start + t])
            paged = append_paged(paged, kn[:, :, start:start + t],
                                 v[:, :, start:start + t])
            start += t
        assert start == n
    else:
        cont = append(cont, kn, v)
        paged = append_paged(paged, kn, v)
    return cont, paged


@pytest.mark.parametrize("use_kernel", [False, True])
@pytest.mark.parametrize("n", [100, 256])  # non-multiple and multiple of ps
def test_paged_decode_matches_contiguous(use_kernel, n):
    rng = np.random.default_rng(0)
    b, kvh, d = 2, 4, 64
    cont, paged = _setup(rng, b, kvh, n, d, ps=128)
    q = jnp.asarray(rng.standard_normal((b, kvh, d)), jnp.float32)

    o_cont = quantized_decode_attention(q, cont)
    o_paged = paged_decode_attention(q, paged, use_kernel=use_kernel)
    assert float(jnp.abs(o_cont - o_paged).max()) < 1e-5


def test_paged_chunked_append_matches_single():
    rng = np.random.default_rng(1)
    b, kvh, d, n = 2, 2, 32, 128
    _, paged_once = _setup(np.random.default_rng(1), b, kvh, n, d, ps=128)
    _, paged_chunks = _setup(np.random.default_rng(1), b, kvh, n, d, ps=128,
                             t_steps=[5, 59, 64])
    assert bool((paged_once.k8 == paged_chunks.k8).all())
    assert bool((paged_once.v8 == paged_chunks.v8).all())
    assert int(paged_once.length[0]) == int(paged_chunks.length[0]) == n


def test_paged_gqa_decode():
    # grouped-query: h=8 query heads over kvh=2 KV heads
    rng = np.random.default_rng(2)
    b, kvh, h, d, n = 2, 2, 8, 64, 50
    cont, paged = _setup(rng, b, kvh, n, d, ps=128)
    q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.float32)
    o_cont = quantized_decode_attention(q, cont)
    o_paged = paged_decode_attention(q, paged)
    assert float(jnp.abs(o_cont - o_paged).max()) < 1e-5


def test_allocator_reuse():
    alloc = PageAllocator(8)  # pages 1..7 free (0 = null)
    a = alloc.alloc(3)
    assert len(set(a)) == 3 and 0 not in a
    alloc.release(a)
    b = alloc.alloc(7)
    assert len(set(b)) == 7 and 0 not in b
    with pytest.raises(RuntimeError):
        alloc.alloc(1)


def test_append_past_table_goes_to_null_page():
    """Regression (ADVICE r1): positions beyond the page table (e.g.
    bucket-pad tokens when a slot already holds max_pages) must scatter to
    the null page, not clip onto the slot's last real page."""
    rng = np.random.default_rng(7)
    ps, mp, d = 128, 2, 8
    paged = init_paged_cache(4, 1, ps, d, 1, mp)
    paged = paged._replace(page_table=jnp.asarray([[1, 2]], np.int32))

    k = jnp.asarray(rng.standard_normal((1, 1, 250, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 1, 250, d)), jnp.float32)
    paged = append_paged(paged, l2norm_tensors(k), v)
    before = np.asarray(paged.k8)

    # 20 more tokens: pos 250..269 -> 250..255 legit (page 2),
    # 256..269 past the table -> must land on null page 0
    k2 = jnp.asarray(rng.standard_normal((1, 1, 20, d)), jnp.float32)
    v2 = jnp.asarray(rng.standard_normal((1, 1, 20, d)), jnp.float32)
    paged = append_paged(paged, l2norm_tensors(k2), v2)
    after = np.asarray(paged.k8)

    # tokens 128..249 live in page 2 at offsets 0..121: untouched
    np.testing.assert_array_equal(after[2, :, :, :122], before[2, :, :, :122])
    # the legit tail (tokens 250..255, offsets 122..127 of page 2) changed
    assert not np.array_equal(after[2, :, :, 122:], before[2, :, :, 122:])
