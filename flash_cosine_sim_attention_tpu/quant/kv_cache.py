"""Quantized KV cache for cosine-sim attention decode.

New capability beyond the reference (BASELINE.json north star): the
bounded-logit property makes the K cache *trivially* quantizable —

  * K is l2-normalized, so every component lies in [-1, 1]: int8 with the
    FIXED scale 127 loses no range and needs no per-row scale factors.
    Logit error from K quantization is bounded by ``attn_scale * ||dq||``
    with ||dq|| <= sqrt(d)/254 per unit query — known at compile time.
  * V is unbounded, so it carries one f32 scale per (batch, kv_head, token)
    row, dequantized inside the attention tile (fused, never materialized).

The cache is a fixed-capacity ring-free append buffer (b, kvh, capacity, d)
plus a current length; ``append`` writes one token step (decode) or a
prefill chunk.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

K_SCALE = 127.0  # fixed: K components are in [-1, 1] after l2norm


class QuantKVCache(NamedTuple):
    k8: jax.Array        # (b, kvh, cap, d) int8, l2-normalized K * 127
    v8: jax.Array        # (b, kvh, cap, d) int8
    v_scale: jax.Array   # (b, kvh, cap, 1) f32 per-token V scale
    length: jax.Array    # (b,) int32 — valid tokens PER SLOT (continuous
                         # batching: slots advance independently)

    @property
    def capacity(self) -> int:
        return self.k8.shape[2]


def init_cache(batch: int, kv_heads: int, capacity: int, dim_head: int
               ) -> QuantKVCache:
    return QuantKVCache(
        k8=jnp.zeros((batch, kv_heads, capacity, dim_head), jnp.int8),
        v8=jnp.zeros((batch, kv_heads, capacity, dim_head), jnp.int8),
        v_scale=jnp.zeros((batch, kv_heads, capacity, 1), jnp.float32),
        length=jnp.zeros((batch,), jnp.int32),
    )


def quantize_k(k_norm: jax.Array) -> jax.Array:
    """l2-normalized K -> int8 at the fixed scale (no metadata needed)."""
    return jnp.round(
        jnp.clip(k_norm.astype(jnp.float32) * K_SCALE, -127, 127)
    ).astype(jnp.int8)


def quantize_v(v: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """V -> (int8 values, per-token f32 scale)."""
    amax = jnp.max(jnp.abs(v.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    v8 = jnp.round(
        jnp.clip(v.astype(jnp.float32) / scale, -127, 127)
    ).astype(jnp.int8)
    return v8, scale


def dequantize_k(k8: jax.Array, dtype=jnp.float32) -> jax.Array:
    return (k8.astype(jnp.float32) * (1.0 / K_SCALE)).astype(dtype)


def dequantize_v(v8: jax.Array, v_scale: jax.Array,
                 dtype=jnp.float32) -> jax.Array:
    return (v8.astype(jnp.float32) * v_scale).astype(dtype)


def append(cache: QuantKVCache, k_norm: jax.Array, v: jax.Array
           ) -> QuantKVCache:
    """Append a (b, kvh, t, d) chunk of NEW tokens (t=1 for decode) at each
    slot's own write offset.

    ``k_norm`` must already be l2-normalized (grouped norms included —
    quantization only assumes components in [-1, 1], true for any group
    size).
    """
    t = k_norm.shape[2]
    upd = jax.vmap(
        lambda buf, new, off: jax.lax.dynamic_update_slice(
            buf, new, (0, off, 0)))
    k8 = upd(cache.k8, quantize_k(k_norm), cache.length)
    v8_new, vs_new = quantize_v(v)
    v8 = upd(cache.v8, v8_new, cache.length)
    v_scale = upd(cache.v_scale, vs_new, cache.length)
    return QuantKVCache(k8, v8, v_scale, cache.length + t)
