"""Decode-path benchmark: ms/token vs context length, per KV format.

Compares the fused-dequant Pallas decode kernel over int8 / fp8 caches
against an XLA einsum decode over a bf16 KV cache (what a user writes
without the kernel) and an XLA einsum decode over the int8 cache with
explicit dequant (lets XLA fuse the upcast).  Decode is HBM-bandwidth-
bound, so int8 formats should approach 2x bf16 at long context.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from flash_cosine_sim_attention_tpu import l2norm_tensors
from flash_cosine_sim_attention_tpu.quant import (
    FP8_DTYPE,
    K_SCALE,
    QuantKVCache,
    append,
    init_cache,
    quantized_decode_attention,
)
from flash_cosine_sim_attention_tpu.utils import benchmark


def xla_decode(q, k, v, length, scale=8.0, k_dequant=1.0, v_scale=None):
    """Einsum decode; k may be bf16 or int8-as-anything (dequant folded)."""
    s = jnp.einsum("bhd,bhjd->bhj", q.astype(jnp.bfloat16),
                   k.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32) * (scale * k_dequant)
    keep = jnp.arange(k.shape[2])[None, None, :] < length[:, None, None]
    e = jnp.where(keep, jnp.exp(s - scale), 0.0)
    if v_scale is not None:  # (b, h, j, 1) per-token V scale
        e = e * v_scale[..., 0].astype(jnp.float32)
    o = jnp.einsum("bhj,bhjd->bhd", e.astype(jnp.bfloat16),
                   v.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    return o / jnp.maximum(e.sum(-1, keepdims=True), 1e-10)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--dim-head", type=int, default=64)
    ap.add_argument("--contexts", type=int, nargs="*",
                    default=[2048, 8192, 32768])
    ap.add_argument("--block-k", type=int, default=2048)
    args = ap.parse_args()

    b, h, d = args.batch, args.heads, args.dim_head
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0].device_kind}   "
          f"b={b} h={h} d={d} block_k={args.block_k}  (ms/token)")
    print(f"{'context':>8} {'bf16 xla':>10} {'int8 xla':>10} "
          f"{'int8 kern':>10} {'fp8 xla':>10} {'best int8/bf16':>15}")

    for ctx in args.contexts:
        cap = ctx
        k = jnp.asarray(rng.standard_normal((b, h, ctx, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, h, ctx, d)), jnp.float32)
        kn = l2norm_tensors(k)
        q = jnp.asarray(rng.standard_normal((b, h, d)), jnp.bfloat16)
        length = jnp.full((b,), ctx, jnp.int32)

        k16, v16 = kn.astype(jnp.bfloat16), v.astype(jnp.bfloat16)
        t_bf16 = benchmark(
            lambda q, k, v, ln: xla_decode(q, k, v, ln),
            q, k16, v16, length, forwards=True, num_times=50)

        i8 = init_cache(b, h, cap, d, kv_dtype=jnp.int8)
        i8 = append(i8, kn, v)
        t_i8_xla = benchmark(
            lambda q, k8, v8, vs, ln: xla_decode(
                q, k8, v8, ln, k_dequant=1.0 / K_SCALE, v_scale=vs),
            q, i8.k8, i8.v8, i8.v_scale, length,
            forwards=True, num_times=50)
        t_i8_kern = benchmark(
            lambda q, k8, v8, vs, ln: quantized_decode_attention(
                q, QuantKVCache(k8, v8, vs, ln), block_k=args.block_k,
                use_kernel=True),
            q, i8.k8, i8.v8, i8.v_scale, i8.length,
            forwards=True, num_times=50)

        f8 = init_cache(b, h, cap, d, kv_dtype=FP8_DTYPE)
        f8 = append(f8, kn, v)
        t_f8_xla = benchmark(
            lambda q, k8, v8, vs, ln: quantized_decode_attention(
                q, QuantKVCache(k8, v8, vs, ln)),
            q, f8.k8, f8.v8, f8.v_scale, f8.length,
            forwards=True, num_times=50)

        best = min(t_i8_xla, t_i8_kern)
        print(f"{ctx:>8} {t_bf16:>10.3f} {t_i8_xla:>10.3f} "
              f"{t_i8_kern:>10.3f} {t_f8_xla:>10.3f} "
              f"{t_bf16 / best:>14.2f}x", flush=True)


if __name__ == "__main__":
    main()
