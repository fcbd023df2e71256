"""INT8 KV-cache + decode kernel tests.

Stated accuracy deltas (BASELINE.md "within stated delta"):
  * decode kernel vs dequant-everything oracle: < 5e-3 (same math, kernel
    quantization error only from bf16 matmuls)
  * decode over int8 cache vs full-f32 attention: < 3e-2 absolute on
    unit-scale values (int8 K at fixed scale 127 + per-token-scaled int8 V)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_cosine_sim_attention_tpu import (
    flash_cosine_sim_attention,
    l2norm_tensors,
)
from flash_cosine_sim_attention_tpu.quant import (
    K_SCALE,
    append,
    dequantize_k,
    dequantize_v,
    init_cache,
    quantize_k,
    quantize_v,
    quantized_decode_attention,
    reference_decode_attention,
)

DELTA_KERNEL_VS_ORACLE = 5e-3
DELTA_QUANT_VS_F32 = 3e-2


def test_k_quantization_roundtrip():
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.standard_normal((2, 4, 64, 64)), jnp.float32)
    kn = l2norm_tensors(k)
    k8 = quantize_k(kn)
    err = float(jnp.abs(dequantize_k(k8) - kn).max())
    assert err <= 0.5 / K_SCALE + 1e-6  # half-ulp rounding bound


def test_v_quantization_roundtrip():
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.standard_normal((2, 4, 64, 64)) * 7.3, jnp.float32)
    v8, vs = quantize_v(v)
    err = jnp.abs(dequantize_v(v8, vs) - v)
    # error bounded by half a quantization step per row
    assert bool((err <= vs * 0.5 + 1e-6).all())


def _fill_cache(rng, b, kvh, cap, d, n_tokens, groups=1):
    cache = init_cache(b, kvh, cap, d)
    k = jnp.asarray(rng.standard_normal((b, kvh, n_tokens, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, kvh, n_tokens, d)), jnp.float32)
    kn = l2norm_tensors(k, groups=groups)
    cache = append(cache, kn, v)
    return cache, k, v


@pytest.mark.parametrize("kvh,h", [(4, 4), (1, 8)])
@pytest.mark.parametrize("n_tokens", [63, 256])
@pytest.mark.parametrize("use_kernel", [False, True])
@pytest.mark.parametrize("d", [64, 32, 128])
def test_decode_kernel_vs_oracle(kvh, h, n_tokens, use_kernel, d):
    """d=64 exercises the lane-packed kernel at tpr=2, d=32 at tpr=4
    (four tokens per 128-lane row; distinct parity-recovery unroll),
    d=128 the degenerate tpr=1 packing (one token per row, no parity
    recovery)."""
    rng = np.random.default_rng(2)
    b, cap = 2, 256
    cache, _, _ = _fill_cache(rng, b, kvh, cap, d, n_tokens)
    q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.float32)
    out = quantized_decode_attention(q, cache, block_k=128,
                                     use_kernel=use_kernel)
    ref = reference_decode_attention(q, cache)
    assert float(jnp.abs(out - ref).max()) < DELTA_KERNEL_VS_ORACLE


def test_decode_matches_full_precision_attention():
    """int8-cache decode vs full-f32 fused attention on the same history."""
    rng = np.random.default_rng(3)
    b, h, d, n, cap = 2, 4, 64, 192, 256
    cache, k, v = _fill_cache(rng, b, h, cap, d, n)
    q = jnp.asarray(rng.standard_normal((b, h, 1, d)), jnp.float32)

    out_q = quantized_decode_attention(q, cache, block_k=128)
    # f32 path: same query against the unquantized history
    out_f = flash_cosine_sim_attention(
        q, k, v, mask=jnp.ones((b, n), bool))
    assert out_q.shape == out_f.shape
    assert float(jnp.abs(out_q - out_f).max()) < DELTA_QUANT_VS_F32


def test_append_is_incremental():
    rng = np.random.default_rng(4)
    b, kvh, d, cap = 1, 2, 32, 128
    cache = init_cache(b, kvh, cap, d)
    ks = jnp.asarray(rng.standard_normal((b, kvh, 10, d)), jnp.float32)
    vs = jnp.asarray(rng.standard_normal((b, kvh, 10, d)), jnp.float32)
    kn = l2norm_tensors(ks)
    # chunk append == token-by-token append
    c_all = append(cache, kn, vs)
    c_steps = cache
    for t in range(10):
        c_steps = append(c_steps, kn[:, :, t:t + 1], vs[:, :, t:t + 1])
    assert int(c_all.length[0]) == int(c_steps.length[0]) == 10
    assert bool((c_all.k8 == c_steps.k8).all())
    assert bool((c_all.v8 == c_steps.v8).all())
    assert bool(jnp.allclose(c_all.v_scale, c_steps.v_scale))


def test_fp8_cache_decode():
    """e4m3 KV cache: metadata-free storage, same fused decode kernel."""
    from flash_cosine_sim_attention_tpu.quant import FP8_DTYPE
    rng = np.random.default_rng(6)
    b, h, d, n, cap = 2, 4, 64, 192, 256
    cache = init_cache(b, h, cap, d, kv_dtype=FP8_DTYPE)
    assert cache.is_fp8
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    kn = l2norm_tensors(k)
    cache = append(cache, kn, v)

    q = jnp.asarray(rng.standard_normal((b, h, 1, d)), jnp.float32)
    out_q = quantized_decode_attention(q, cache, block_k=128)
    ref = reference_decode_attention(q, cache)
    assert float(jnp.abs(out_q - ref).max()) < DELTA_KERNEL_VS_ORACLE

    # fp8 is coarser than int8 but must stay within ~2x the stated delta
    out_f = flash_cosine_sim_attention(q, k, v, mask=jnp.ones((b, n), bool))
    assert float(jnp.abs(out_q - out_f).max()) < 2 * DELTA_QUANT_VS_F32


def test_fp8_roundtrip_bounds():
    from flash_cosine_sim_attention_tpu.quant import FP8_DTYPE
    rng = np.random.default_rng(7)
    k = jnp.asarray(rng.standard_normal((2, 2, 32, 32)), jnp.float32)
    kn = l2norm_tensors(k)
    k8 = quantize_k(kn, FP8_DTYPE)
    assert k8.dtype == FP8_DTYPE
    # e4m3 relative error is ~2^-4 near 1.0; absolute error on [-1,1] values
    assert float(jnp.abs(dequantize_k(k8) - kn).max()) < 1.0 / 16


def test_grouped_l2norm_cache():
    # grouped norms keep components in [-1, 1]; kernel must stay accurate
    rng = np.random.default_rng(5)
    b, h, d, n, cap = 2, 4, 64, 100, 128
    cache, _, _ = _fill_cache(rng, b, h, cap, d, n, groups=8)
    q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.float32)
    out = quantized_decode_attention(q, cache, groups=8, scale=1.0,
                                     block_k=128)
    ref = reference_decode_attention(q, cache, groups=8, scale=1.0)
    assert float(jnp.abs(out - ref).max()) < DELTA_KERNEL_VS_ORACLE


# ---------------------------------------------------------------------------
# int8 weight quantization (serving path)
# ---------------------------------------------------------------------------


def test_weight_quantization_roundtrip():
    from flash_cosine_sim_attention_tpu.quant import (
        dequantize_dense_kernel,
        quantize_dense_kernel,
    )
    rng = np.random.default_rng(10)
    w = jnp.asarray(rng.standard_normal((64, 128)) * 0.3, jnp.float32)
    w8, scale = quantize_dense_kernel(w)
    assert w8.dtype == jnp.int8 and scale.shape == (1, 128)
    err = jnp.abs(dequantize_dense_kernel(w8, scale) - w)
    assert bool((err <= scale * 0.5 + 1e-7).all())  # half-step bound


def test_quantized_weights_decode_path():
    """Engine-style prefill+decode with int8 weights tracks the f32-weight
    path (per-channel absmax keeps logits close on a small model)."""
    from flash_cosine_sim_attention_tpu.models import (
        CosineSimCausalTransformer,
    )
    from flash_cosine_sim_attention_tpu.models.decoding import (
        decode_step,
        init_decode_state,
        prefill,
    )
    from flash_cosine_sim_attention_tpu.quant import quantize_params

    model = CosineSimCausalTransformer(
        num_tokens=64, dim=64, depth=2, max_seq_len=64, heads=4,
        dim_head=16, pre_norm=True, attn_scale=1.0, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    prompt = jax.random.randint(rng, (1, 24), 0, 64)
    params = model.init(rng, prompt)
    params_q = quantize_params(params)

    # quantized pytree: every 2-D kernel replaced, everything else intact
    leaves_q = {p for p, _ in jax.tree_util.tree_flatten_with_path(
        params_q)[0]}
    assert not any("kernel'" in str(p) and "kernel_q" not in str(p)
                   and "kernel_scale" not in str(p) for p in leaves_q)

    st_f = init_decode_state(model, 1, 64)
    lf, st_f = prefill(model, params, st_f, prompt)
    st_q = init_decode_state(model, 1, 64)
    lq, st_q = prefill(model, params_q, st_q, prompt)
    rel = float(jnp.linalg.norm(lq - lf) / jnp.linalg.norm(lf))
    assert rel < 0.05, rel

    tok = jnp.argmax(lf, -1).astype(jnp.int32)
    lf2, _ = decode_step(model, params, st_f, tok)
    lq2, _ = decode_step(model, params_q, st_q, tok)
    rel2 = float(jnp.linalg.norm(lq2 - lf2) / jnp.linalg.norm(lf2))
    assert rel2 < 0.08, rel2


def test_quantized_matmul_kernel():
    """Pallas fused-dequant matmul vs exact dequant (runs in interpret
    mode on CPU; on v5e it streams int8 from HBM at bandwidth SOL)."""
    from flash_cosine_sim_attention_tpu.quant import (
        quantize_dense_kernel,
        quantized_matmul,
    )
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((8, 256)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((256, 512)) * 0.1, jnp.float32)
    w8, scale = quantize_dense_kernel(w)
    y_k = quantized_matmul(x, w8, scale, block_out=256, block_in=128)
    y_ref = x @ (w8.astype(jnp.float32) * scale)
    rel = float(jnp.linalg.norm(y_k - y_ref) / jnp.linalg.norm(y_ref))
    assert rel < 1e-5, rel
