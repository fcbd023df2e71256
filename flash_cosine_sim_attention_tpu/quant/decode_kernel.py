"""Decode path: cosine-sim attention over a quantized KV cache.

Single-token (q_len=1) autoregressive attention, the serving hot path.
Decode is HBM-bandwidth-bound — the entire KV cache streams through VMEM
per token — so the int8/fp8 cache halves traffic vs bf16 (4x vs f32).

Two implementations with identical semantics:

  * ``_decode_kernel`` (default for int8): Pallas, dequant fused into
    the attention tile.  Grid (batch, kv_blocks) with ALL kv heads in
    each block (a per-(b, head) grid pays per-step overhead on 1-row
    matvecs) and length-clamped block elision: slot lengths ride as
    scalar-prefetch so the index maps re-fetch the last live block
    instead of streaming dead capacity.  Measured at 86% of the
    cache-streaming bound (b8 kvh16 d128) and faster than the einsum at
    every probed shape.
  * ``_xla_decode`` (``use_kernel=False``; default for fp8): plain
    einsums over the quantized buffers — XLA vectorizes the e4m3 upcast
    that Mosaic lowers pathologically.

Dequant placement:

  * K dequant is a constant multiply (fixed scale 127 for int8 — K is
    normalized; 1 for e4m3), which folds into the already-fused
    ``exp(scale*s - scale)`` epilogue: we feed the MXU the raw
    quantized-as-bf16 K and fold the dequant into the logit scale.
  * int8 V's per-token scale is folded into the exp weights BEFORE the
    PV matmul, so V's int8 values go straight to the MXU; fp8 V is
    stored unscaled and needs no fold at all.

No running row-max, as everywhere in this framework: logits are bounded.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.blocks import EPS
from ..ops.reference import l2norm_tensors
from .kv_cache import QuantKVCache, dequantize_k, dequantize_v


def _decode_kernel(
    *refs,
    # len_ref   SMEM (b, 1) int32: ALL slots' cache lengths (whole-array
    #           block: Mosaic requires SMEM blocks be full dims; indexed
    #           by the batch grid axis inside the kernel)
    # q_ref     (1, kvh, g, d) bf16/f32 — l2-normalized query groups
    # k8_ref    (1, kvh, block_k, d) int8 or e4m3
    # v8_ref    (1, kvh, block_k, d) int8 or e4m3
    # vs_ref    (1, kvh, 1, block_k) f32 per-token V scale (int8 only)
    # o_ref     (1, kvh, g, d) f32
    # acc_ref   scratch (kvh*g, d) f32
    # lsum_ref  scratch (kvh*g, 1) f32
    #
    # ALL kv heads ride one grid step (grid = (b, nk)): a per-(b, head)
    # grid pays per-step overhead on every 1-row matvec, which dominated
    # the bandwidth-bound stream (same lesson as the paged kernel's
    # whole-page DMAs — measured 1.7x at 0.8B scale).
    scale: float,
    k_dequant_scale: float,
    has_vscale: bool,
    block_k: int,
    kv_heads: int,
    group: int,
):
    idx = 0
    len_ref = refs[idx]; idx += 1  # scalar-prefetched (b,) lengths (SMEM)
    q_ref = refs[idx]; idx += 1
    k8_ref = refs[idx]; idx += 1
    v8_ref = refs[idx]; idx += 1
    vs_ref = None
    if has_vscale:
        vs_ref = refs[idx]; idx += 1
    o_ref, acc_ref, lsum_ref = refs[idx : idx + 3]

    ki = pl.program_id(1)
    nk = pl.num_programs(1)
    length = len_ref[pl.program_id(0)]

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        lsum_ref[...] = jnp.zeros_like(lsum_ref)

    @pl.when(ki * block_k < length)
    def _compute():
        col = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (group, block_k), 1)
        keep = col < length
        for h in range(kv_heads):
            q = q_ref[0, h]                   # (g, d)
            k_q = k8_ref[0, h]                # (block_k, d) int8/e4m3
            v_q = v8_ref[0, h]                # (block_k, d) int8/e4m3

            # quantized K -> bf16 for the MXU; the dequant (1/127 for
            # int8, 1 for fp8) folds into the logit scale below — one
            # fused constant, no extra pass over K
            s = jax.lax.dot_general(
                q.astype(jnp.bfloat16), k_q.astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (g, block_k), units of cos/k_dequant_scale

            e = jnp.exp(s * (scale * k_dequant_scale) - scale)
            e = jnp.where(keep, e, 0.0)

            r = slice(h * group, (h + 1) * group)
            lsum_ref[r, :] += jnp.sum(e, axis=-1, keepdims=True)
            # int8: fold V's per-token scale into the exp weights so raw
            # int8 V (as bf16) hits the MXU directly; the scale arrives
            # pre-viewed as (1, block_k) — a free relayout of the
            # trailing (cap, 1) dims.  (Scaling V's rows instead would
            # need a (block_k, 1) f32 block, whose lane dim pads 1->128
            # in VMEM: 8MB per buffer at block 2048.)
            e_scaled = ((e * vs_ref[0, h]) if has_vscale else e
                        ).astype(jnp.bfloat16)
            acc_ref[r, :] += jax.lax.dot_general(
                e_scaled, v_q.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(ki == nk - 1)
    def _finalize():
        inv_l = 1.0 / jnp.maximum(lsum_ref[...], EPS)
        out = acc_ref[...] * inv_l
        o_ref[0] = out.reshape(kv_heads, group, out.shape[-1])


def _xla_decode(q, cache: QuantKVCache, scale: float):
    """XLA-fused decode: int8/fp8 K/V stream from HBM and upcast inside
    the fused matmul loop.

    ~70% of HBM bandwidth speed-of-light on v5e; the default for fp8
    caches, and the fallback path for explicit ``use_kernel=False``.
    """
    b, kvh, g, d = q.shape
    keep = (jnp.arange(cache.capacity)[None, None, None, :]
            < cache.length[:, None, None, None])
    s = jnp.einsum("bkgd,bkjd->bkgj", q.astype(jnp.bfloat16),
                   cache.k8.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    e = jnp.exp(s * (scale * cache.k_dequant_scale) - scale)
    e = jnp.where(keep, e, 0.0)
    lsum = e.sum(-1, keepdims=True)  # rowsum of UNscaled weights
    if not cache.is_fp8:  # fold per-token V scale into the exp weights
        e = e * cache.v_scale[..., 0][:, :, None, :]
    o = jnp.einsum("bkgj,bkjd->bkgd", e.astype(jnp.bfloat16),
                   cache.v8.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    return o / jnp.maximum(lsum, EPS)


def quantized_decode_attention(
    q: jax.Array,              # (b, h, d) or (b, h, 1, d), one new token
    cache: QuantKVCache,
    scale: float = 8.0,
    groups: int = 1,
    l2norm_qk: bool = True,
    block_k: int = 2048,
    use_kernel: Optional[bool] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Attention of one new query token against the quantized cache.

    Default path (``use_kernel=None``) is the Pallas kernel for int8
    caches (whole-kvh blocks + length-clamped block elision): measured
    faster than the XLA einsum at every probed shape on v5e — 0.098 vs
    0.107 ms (b8 h8 d64 ctx8000), 0.048 vs 0.090 (b8 h8 d128 ctx2000),
    0.093 vs 0.180 (b8 h16 d128 ctx2000, 86% of the cache-streaming
    bound) — and the XLA einsum for fp8 (Mosaic's in-kernel e4m3 upcast
    is pathological; XLA vectorizes it fine, DESIGN.md).
    """
    squeeze = q.ndim == 4
    if squeeze:
        assert q.shape[2] == 1
        q = q[:, :, 0]
    if l2norm_qk:
        q = l2norm_tensors(q, groups=groups)

    b, h, d = q.shape
    kvh = cache.k8.shape[1]
    cap = cache.capacity
    assert h % kvh == 0
    g = h // kvh
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if use_kernel is None:
        # v5e measurements: the kernel wins while the cache is <= 4
        # blocks deep (0.048 vs 0.090 @d128/ctx2k, 0.099 vs 0.116
        # @d64/ctx8k) and loses beyond (0.357 vs 0.227 @16k, 0.709 vs
        # 0.423 @32k — per-step cost jumps once the per-head HBM stride
        # grows past the 2MB block budget), so auto-pick by depth; fp8
        # always takes the einsum (Mosaic's e4m3 upcast is pathological)
        bytes_per_tok = kvh * d * cache.k8.dtype.itemsize
        eff_bk = min(block_k, cap, max(128, (2 << 20) // bytes_per_tok))
        use_kernel = (not cache.is_fp8) and cap <= 4 * eff_bk

    if not use_kernel:
        out = _xla_decode(q.reshape(b, kvh, g, d), cache, float(scale))
        out = out.reshape(b, h, d).astype(q.dtype)
        return out[:, :, None, :] if squeeze else out

    # whole-kvh blocks: bound the K (and V) window to ~2MB each so the
    # double-buffered pair fits VMEM at any (kvh, d)
    bytes_per_tok = kvh * d * cache.k8.dtype.itemsize
    block_k = min(block_k, cap, max(128, (2 << 20) // bytes_per_tok))
    while cap % block_k:
        block_k //= 2
    nk = cap // block_k

    qg = q.reshape(b, kvh, g, d)
    has_vscale = not cache.is_fp8  # fp8 V is stored unscaled

    # Length-clamped block elision (the fwd kernel's causal-DMA-elision
    # trick, driven by RUNTIME lengths): the per-slot length rides as a
    # scalar-prefetch arg so the index maps can clamp the K/V block index
    # at each slot's last live block — blocks past the length re-fetch
    # the same block (free) instead of streaming dead cache.
    def kv_idx(bi, ki, lens):
        last = jnp.maximum(pl.cdiv(lens[bi], block_k) - 1, 0)
        return (bi, 0, jnp.minimum(ki, last), 0)

    in_specs = [
        pl.BlockSpec((1, kvh, g, d), lambda bi, ki, lens: (bi, 0, 0, 0)),
        pl.BlockSpec((1, kvh, block_k, d), kv_idx),
        pl.BlockSpec((1, kvh, block_k, d), kv_idx),
    ]
    args = [qg, cache.k8, cache.v8]
    if has_vscale:
        def vs_idx(bi, ki, lens):
            return (bi, 0, 0, kv_idx(bi, ki, lens)[2])
        in_specs.append(pl.BlockSpec((1, kvh, 1, block_k), vs_idx))
        # (b, kvh, cap, 1) -> (b, kvh, 1, cap): trailing singleton swap,
        # no data movement
        args.append(cache.v_scale.swapaxes(-1, -2))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, kvh, g, d),
                               lambda bi, ki, lens: (bi, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((kvh * g, d), jnp.float32),
            pltpu.VMEM((kvh * g, 1), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _decode_kernel, scale=float(scale),
            k_dequant_scale=cache.k_dequant_scale,
            has_vscale=has_vscale, block_k=block_k, kv_heads=kvh,
            group=g),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kvh, g, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray(cache.length, jnp.int32), *args)

    out = out.reshape(b, h, d).astype(q.dtype)
    return out[:, :, None, :] if squeeze else out


def reference_decode_attention(
    q: jax.Array, cache: QuantKVCache, scale: float = 8.0,
    groups: int = 1, l2norm_qk: bool = True,
) -> jax.Array:
    """Dequantize-everything oracle for the decode kernel."""
    squeeze = q.ndim == 4
    if squeeze:
        q = q[:, :, 0]
    if l2norm_qk:
        q = l2norm_tensors(q, groups=groups)
    b, h, d = q.shape
    kvh = cache.k8.shape[1]
    k = dequantize_k(cache.k8)                       # (b, kvh, cap, d)
    v = dequantize_v(cache.v8, cache.v_scale)
    qg = q.reshape(b, kvh, h // kvh, d).astype(jnp.float32)
    s = jnp.einsum("bgqd,bgjd->bgqj", qg, k,
                   precision=jax.lax.Precision.HIGHEST) * scale
    e = jnp.exp(s - scale)
    keep = (jnp.arange(cache.capacity)[None, None, None, :]
            < cache.length[:, None, None, None])
    e = jnp.where(keep, e, 0.0)
    o = jnp.einsum("bgqj,bgjd->bgqd", e, v,
                   precision=jax.lax.Precision.HIGHEST)
    o = o / jnp.maximum(e.sum(-1, keepdims=True), 1e-10)
    o = o.reshape(b, h, d).astype(q.dtype)
    return o[:, :, None, :] if squeeze else o
