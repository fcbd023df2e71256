"""Seeded random shape/block fuzz for the fused kernels (CPU interpret).

The fixed parity grids sample "nice" sizes; hardware probing in round 2
caught a dropped-K-columns bug at seq 700 (a 128-rounded size that was
not inner-block-aligned) that every grid missed.  This fuzz draws
arbitrary shapes, head counts, feature flags, and public block overrides
from a seeded rng — deterministic in CI, but covering the ragged
alignment space the grids can't enumerate."""

import jax.numpy as jnp
import numpy as np
import pytest

from test_fused_parity import check, make_inputs


def _draw_case(rng):
    d = int(rng.choice([16, 32, 48, 64, 96, 128]))
    h = int(rng.choice([1, 2, 4, 6]))
    kvh = int(rng.choice([g for g in (1, 2, 3, h) if h % g == 0]))
    b = int(rng.integers(1, 3))
    i = int(rng.integers(33, 769))
    j = int(rng.integers(33, 769))
    causal = bool(rng.random() < 0.5)
    if causal and i > j:
        i, j = j, i  # kv-shorter causal has zero-rowsum rows (own test)
    use_mask = bool(rng.random() < 0.4) and not causal
    use_bias = bool(rng.random() < 0.4)
    bbd = bool(rng.random() < 0.5)
    block_q = rng.choice([None, 128, 256, 512])
    block_k = rng.choice([None, 128, 256])
    block_q = int(block_q) if block_q is not None else None
    block_k = int(block_k) if block_k is not None else None
    dtype = jnp.bfloat16 if rng.random() < 0.25 else jnp.float32
    return dict(b=b, h=h, kvh=kvh, i=i, j=j, d=d, causal=causal,
                use_mask=use_mask, use_bias=use_bias, bbd=bbd,
                block_q=block_q, block_k=block_k, dtype=dtype)


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_parity(seed):
    rng = np.random.default_rng(1000 + seed)
    c = _draw_case(rng)
    q, k, v, mask, bias = make_inputs(
        rng, c["b"], c["h"], c["kvh"], c["i"], c["j"], c["d"],
        c["use_mask"], c["use_bias"], c["bbd"], c["dtype"])
    check(q, k, v, mask, bias, causal=c["causal"], bbd=c["bbd"],
          block_q=c["block_q"], block_k=c["block_k"])


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_decode(seed):
    """Ragged decode fuzz across the packed/unpacked kernel dispatch:
    random head dims (tpr 1/2/4/8), GQA ratios, capacities (not always
    128-aligned with d — exercising the (cap*d) % 128 fallback), fill
    lengths, and block sizes, vs the dequant-everything oracle."""
    from flash_cosine_sim_attention_tpu.quant import (
        append,
        init_cache,
        quantized_decode_attention,
        reference_decode_attention,
    )
    from flash_cosine_sim_attention_tpu import l2norm_tensors

    rng = np.random.default_rng(2000 + seed)
    d = int(rng.choice([16, 32, 64, 128]))
    kvh = int(rng.choice([1, 2, 4]))
    h = kvh * int(rng.choice([1, 2]))
    b = int(rng.integers(1, 3))
    cap = int(rng.choice([96, 128, 192, 256, 384]))
    n_tokens = int(rng.integers(1, cap + 1))
    block_k = int(rng.choice([64, 128, 256]))
    use_kernel = rng.choice([None, True, False])
    use_kernel = bool(use_kernel) if use_kernel is not None else None

    cache = init_cache(b, kvh, cap, d)
    k = jnp.asarray(rng.standard_normal((b, kvh, n_tokens, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, kvh, n_tokens, d)), jnp.float32)
    cache = append(cache, l2norm_tensors(k), v)
    q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.float32)

    out = quantized_decode_attention(q, cache, block_k=block_k,
                                     use_kernel=use_kernel)
    ref = reference_decode_attention(q, cache)
    # kernel-vs-oracle delta is quantization-free in K (both see the same
    # int8) but the kernel's bf16 matmul error grows as components do:
    # normalized d=16 vectors have ~2x the per-component magnitude of
    # d=64, so give small d double the stated delta
    tol = 5e-3 if d >= 32 else 1e-2
    assert float(jnp.abs(out - ref).max()) < tol, (
        d, kvh, h, b, cap, n_tokens, block_k, use_kernel)
