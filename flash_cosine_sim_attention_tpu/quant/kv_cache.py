"""Quantized KV cache for cosine-sim attention decode.

New capability beyond the reference (BASELINE.json north star): the
bounded-logit property makes the K cache *trivially* quantizable —

  * K is l2-normalized, so every component lies in [-1, 1]: int8 with the
    FIXED scale 127 loses no range and needs no per-row scale factors.
    Logit error from K quantization is bounded by ``attn_scale * ||dq||``
    with ||dq|| <= sqrt(d)/254 per unit query — known at compile time.
  * V is unbounded, so in the int8 format it carries one f32 scale per
    (batch, kv_head, token) row, dequantized inside the attention tile
    (fused, never materialized).

Two storage formats, selected with ``kv_dtype``:

  * ``jnp.int8`` (default): fixed-scale-127 K, per-token-scaled V.
    Highest precision per bit for the bounded K.
  * ``jnp.float8_e4m3fn``: metadata-free — both K and V stored as e4m3
    directly (e4m3 range ±448 covers activations; no scale tensor to
    stream at decode time).  ~2x coarser K precision near |x|=1 than
    int8, still well within bf16-comparable attention error.

Either way the cache is half the HBM traffic of bf16 (4x vs f32) on the
bandwidth-bound decode path.

The cache is a fixed-capacity ring-free append buffer (b, kvh, capacity, d)
plus a current length; ``append`` writes one token step (decode) or a
prefill chunk.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

K_SCALE = 127.0  # fixed: K components are in [-1, 1] after l2norm

FP8_DTYPE = jnp.float8_e4m3fn


class QuantKVCache(NamedTuple):
    k8: jax.Array        # (b, kvh, cap, d) int8 (K*127) or e4m3 (K as-is)
    v8: jax.Array        # (b, kvh, cap, d) int8 or e4m3
    v_scale: jax.Array   # (b, kvh, cap, 1) f32 per-token V scale (int8
                         # format only; all-ones placeholder for fp8)
    length: jax.Array    # (b,) int32 — valid tokens PER SLOT (continuous
                         # batching: slots advance independently)

    @property
    def capacity(self) -> int:
        return self.k8.shape[2]

    @property
    def is_fp8(self) -> bool:
        return self.k8.dtype == FP8_DTYPE

    @property
    def k_dequant_scale(self) -> float:
        """Multiply raw K storage values by this to recover cos-sim units."""
        return 1.0 if self.is_fp8 else 1.0 / K_SCALE


def init_cache(batch: int, kv_heads: int, capacity: int, dim_head: int,
               kv_dtype=jnp.int8) -> QuantKVCache:
    assert kv_dtype in (jnp.int8, FP8_DTYPE), kv_dtype
    return QuantKVCache(
        k8=jnp.zeros((batch, kv_heads, capacity, dim_head), kv_dtype),
        v8=jnp.zeros((batch, kv_heads, capacity, dim_head), kv_dtype),
        v_scale=(jnp.zeros if kv_dtype == jnp.int8 else jnp.ones)(
            (batch, kv_heads, capacity, 1), jnp.float32),
        length=jnp.zeros((batch,), jnp.int32),
    )


def quantize_k(k_norm: jax.Array, kv_dtype=jnp.int8) -> jax.Array:
    """l2-normalized K -> quantized storage (no metadata needed)."""
    if kv_dtype == FP8_DTYPE:
        return k_norm.astype(FP8_DTYPE)
    return jnp.round(
        jnp.clip(k_norm.astype(jnp.float32) * K_SCALE, -127, 127)
    ).astype(jnp.int8)


def quantize_v(v: jax.Array, kv_dtype=jnp.int8
               ) -> Tuple[jax.Array, jax.Array]:
    """V -> (quantized values, per-token f32 scale).

    fp8 stores V directly (scale tensor is all-ones and unused by the
    decode kernel); int8 computes a per-token absmax scale.
    """
    if kv_dtype == FP8_DTYPE:
        # e4m3 max finite value is 448; clip to avoid inf on outliers
        v8 = jnp.clip(v.astype(jnp.float32), -448.0, 448.0).astype(FP8_DTYPE)
        scale = jnp.ones((*v.shape[:-1], 1), jnp.float32)
        return v8, scale
    amax = jnp.max(jnp.abs(v.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    v8 = jnp.round(
        jnp.clip(v.astype(jnp.float32) / scale, -127, 127)
    ).astype(jnp.int8)
    return v8, scale


def dequantize_k(k8: jax.Array, dtype=jnp.float32) -> jax.Array:
    scale = 1.0 if k8.dtype == FP8_DTYPE else 1.0 / K_SCALE
    return (k8.astype(jnp.float32) * scale).astype(dtype)


def dequantize_v(v8: jax.Array, v_scale: jax.Array,
                 dtype=jnp.float32) -> jax.Array:
    if v8.dtype == FP8_DTYPE:
        return v8.astype(dtype)
    return (v8.astype(jnp.float32) * v_scale).astype(dtype)


def append(cache: QuantKVCache, k_norm: jax.Array, v: jax.Array,
           active=None) -> QuantKVCache:
    """Append a (b, kvh, t, d) chunk of NEW tokens (t=1 for decode) at each
    slot's own write offset.

    ``k_norm`` must already be l2-normalized (grouped norms included —
    quantization only assumes components in [-1, 1], true for any group
    size).

    ``active`` (optional (b,) bool) supports continuous batching: an
    inactive slot's length does not advance, so its ride-along write
    lands at its current length — beyond the valid region, overwritten
    by the slot's next real append (the caller guarantees
    length + t <= capacity, else dynamic_update_slice would clamp the
    write back over valid entries).
    """
    t = k_norm.shape[2]
    kv_dtype = cache.k8.dtype
    upd = jax.vmap(
        lambda buf, new, off: jax.lax.dynamic_update_slice(
            buf, new, (0, off, 0)))
    k8 = upd(cache.k8, quantize_k(k_norm, kv_dtype), cache.length)
    v8_new, vs_new = quantize_v(v, kv_dtype)
    v8 = upd(cache.v8, v8_new, cache.length)
    v_scale = upd(cache.v_scale, vs_new, cache.length)
    new_len = cache.length + (t if active is None
                              else t * active.astype(jnp.int32))
    return QuantKVCache(k8, v8, v_scale, new_len)
