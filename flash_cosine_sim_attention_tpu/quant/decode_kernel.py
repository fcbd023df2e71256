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


def _decode_kernel_packed(
    *refs,
    # len_ref   SMEM (b,) int32 (scalar-prefetched slot lengths)
    # qc_ref    (1, kvh, tpr*g, 128) bf16 — block-diagonal packed queries
    # kp_ref    (1, kvh, rpc, 128) int8 — packed K rows (tpr tokens/row)
    # vp_ref    (1, kvh, rpc, 128) int8 — packed V rows
    # vs_ref    (1, kvh, tpr, ck/tpr) f32 — parity-split V scales
    # o_ref     (1, kvh, g, d) f32
    # acc/lsum  scratch (kvh*g, d) / (kvh*g, 1) f32
    scale: float,
    k_dequant_scale: float,
    has_vscale: bool,
    chunk_k: int,
    kv_heads: int,
    group: int,
    tpr: int,          # tokens per 128-lane row (128 // d)
    d: int,
):
    """Lane-packed int8 decode tile (long-context path).

    The natural (cap, d) int8 cache layout lane-pads d=64 -> 128 inside
    VMEM blocks (int8 tiling is (32, 128)), wasting half of every DMA and
    every VMEM byte; at d=32 it's 4x.  This kernel instead views the
    cache as full (128,)-lane rows holding ``tpr`` consecutive tokens
    each, so blocks stream at full density, and recovers per-token
    semantics on the MXU:

      * QK: ONE dot of the block-diagonal query stack ``qcat``
        ((tpr*g, 128), parity p's query occupying lanes p*d:(p+1)*d)
        against packed-K rows — row block p of the output is parity p's
        scores.  Bonus: the contraction is 128 deep (full MXU rate; the
        unpacked kernel ran d=64 at half fill).
      * PV: ONE dot of the masked exp weights against packed-V rows
        ((tpr*g, 128) out); parity p keeps lanes p*d:(p+1)*d of row
        block p, the rest is discarded (decode is bandwidth-bound —
        the extra MXU work is free).
      * V's per-token scale arrives parity-split as (tpr, ck/tpr) (a
        tiny per-call XLA relayout of the (cap, 1) scales).
    """
    idx = 0
    len_ref = refs[idx]; idx += 1
    qc_ref = refs[idx]; idx += 1
    kp_ref = refs[idx]; idx += 1
    vp_ref = refs[idx]; idx += 1
    vs_ref = None
    if has_vscale:
        vs_ref = refs[idx]; idx += 1
    o_ref, acc_ref, lsum_ref = refs[idx : idx + 3]

    ki = pl.program_id(1)
    nk = pl.num_programs(1)
    length = len_ref[pl.program_id(0)]
    cols = chunk_k // tpr          # packed columns per chunk

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        lsum_ref[...] = jnp.zeros_like(lsum_ref)

    @pl.when(ki * chunk_k < length)
    def _compute():
        # token id of packed column c, parity p: ki*chunk_k + c*tpr + p
        base = ki * chunk_k + jax.lax.broadcasted_iota(
            jnp.int32, (tpr, 1, cols), 2) * tpr + jax.lax.broadcasted_iota(
            jnp.int32, (tpr, 1, cols), 0)
        keep = (base < length)                       # (tpr, 1, cols)
        keep = jnp.broadcast_to(keep, (tpr, group, cols)).reshape(
            tpr * group, cols)
        for h in range(kv_heads):
            qc = qc_ref[0, h]                        # (tpr*g, 128) bf16
            kp = kp_ref[0, h]                        # (rpc, 128) int8
            vp = vp_ref[0, h]
            s = jax.lax.dot_general(
                qc, kp.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (tpr*g, cols)
            e = jnp.exp(s * (scale * k_dequant_scale) - scale)
            e = jnp.where(keep, e, 0.0)
            # parity p's rowsum lives in row block p; a query's total is
            # the sum over its tpr parity rows
            ls = jnp.sum(e, axis=-1, keepdims=True)  # (tpr*g, 1)
            ls = ls.reshape(tpr, group, 1).sum(axis=0)
            r = slice(h * group, (h + 1) * group)
            lsum_ref[r, :] += ls
            if has_vscale:
                vs = vs_ref[0, h][:, None, :]        # (tpr, 1, cols)
                vs = jnp.broadcast_to(
                    vs, (tpr, group, cols)).reshape(tpr * group, cols)
                e = e * vs
            pv = jax.lax.dot_general(
                e.astype(jnp.bfloat16), vp.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (tpr*g, 128)
            upd = pv[0:group, 0:d]
            for p in range(1, tpr):
                upd = upd + pv[p * group:(p + 1) * group,
                               p * d:(p + 1) * d]
            acc_ref[r, :] += upd

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


def _kernel_decode_packed(q, cache: QuantKVCache, scale: float,
                          block_k: int, interpret: bool):
    """Launch the lane-packed decode kernel (int8, d dividing 128)."""
    b, h, d = q.shape
    kvh = cache.k8.shape[1]
    g = h // kvh
    cap = cache.capacity
    tpr = 128 // d

    # tokens per grid step; keep the double-buffered K+V windows ~2MB each
    bytes_per_tok = kvh * d * cache.k8.dtype.itemsize
    block_k = min(block_k, cap, max(128, (2 << 20) // bytes_per_tok))
    while cap % block_k:
        block_k //= 2
    block_k = max(block_k, tpr)
    nk = cap // block_k
    rpc = block_k * d // 128       # packed rows per chunk
    cols = block_k // tpr          # packed columns per chunk

    # full-lane row views of the caches (free reshapes of the row-major
    # (cap, d) layout: tpr consecutive tokens per 128-lane row)
    kp = cache.k8.reshape(b, kvh, cap * d // 128, 128)
    vp = cache.v8.reshape(b, kvh, cap * d // 128, 128)

    # block-diagonal query stack: parity p's query in row block p, lanes
    # p*d:(p+1)*d (tiny; built per call in XLA)
    qg = q.reshape(b, kvh, g, d).astype(jnp.bfloat16)
    qc = jnp.zeros((b, kvh, tpr, g, 128), jnp.bfloat16)
    for p in range(tpr):
        qc = qc.at[:, :, p, :, p * d:(p + 1) * d].set(qg)
    qc = qc.reshape(b, kvh, tpr * g, 128)

    def clamp(ki, lens, bi):
        last = jnp.maximum(pl.cdiv(lens[bi], block_k) - 1, 0)
        return jnp.minimum(ki, last)

    in_specs = [
        pl.BlockSpec((1, kvh, tpr * g, 128),
                     lambda bi, ki, lens: (bi, 0, 0, 0)),
        pl.BlockSpec((1, kvh, rpc, 128),
                     lambda bi, ki, lens: (bi, 0, clamp(ki, lens, bi), 0)),
        pl.BlockSpec((1, kvh, rpc, 128),
                     lambda bi, ki, lens: (bi, 0, clamp(ki, lens, bi), 0)),
    ]
    args = [qc, kp, vp]
    has_vscale = not cache.is_fp8
    if has_vscale:
        # parity-split V scales: (cap, 1) -> (tpr, cap/tpr) per head (a
        # tiny XLA relayout, ~d-fold smaller than the cache stream)
        vs = cache.v_scale[..., 0].reshape(
            b, kvh, cap // tpr, tpr).swapaxes(-1, -2)
        args.append(vs)
        in_specs.append(
            pl.BlockSpec((1, kvh, tpr, cols),
                         lambda bi, ki, lens: (bi, 0, 0,
                                               clamp(ki, lens, bi))))

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
            _decode_kernel_packed, scale=float(scale),
            k_dequant_scale=cache.k_dequant_scale,
            has_vscale=has_vscale, chunk_k=block_k, kv_heads=kvh,
            group=g, tpr=tpr, d=d),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, kvh, g, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray(cache.length, jnp.int32), *args)
    return out


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
    caches (whole-kvh blocks + length-clamped block elision), and the
    XLA einsum for fp8 (Mosaic's in-kernel e4m3 upcast is pathological;
    XLA vectorizes it fine, DESIGN.md).  v5e r5 measurements (ms/token,
    kernel vs int8 einsum): 0.031 vs 0.029 (b8 h8 d64 ctx2048), 0.097
    vs 0.117 (ctx8192), 0.182 vs 0.234 (ctx16384), 0.343 vs 0.351
    (ctx24576), 0.723 vs 1.116 (b8 h16 d128 ctx16384), 0.048 vs 0.057
    (b1 h8 d64 ctx32768).  The one probed shape where the kernel loses
    is a COMPLETELY FULL 32k cache at b8 d64 (0.543 vs 0.384 — ~490
    GB/s vs ~710; every structural suspect was A/B'd away: block size
    2048-16384, window 2-8 MB, grid order, head striding, footprint).
    The kernel stays the default because its cost tracks the live
    LENGTHS (clamped block elision) while the einsum always streams
    full capacity — a 32k-capacity slot at typical partial fill is far
    cheaper on the kernel, and ``use_kernel=False`` is the explicit
    escape hatch for always-full 32k+ d64 workloads.
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
        # fp8 always takes the einsum (Mosaic's e4m3 upcast is
        # pathological); int8 takes a Pallas kernel everywhere
        use_kernel = not cache.is_fp8

    if not use_kernel:
        out = _xla_decode(q.reshape(b, kvh, g, d), cache, float(scale))
        out = out.reshape(b, h, d).astype(q.dtype)
        return out[:, :, None, :] if squeeze else out

    if 128 % d == 0 and (cap * d) % 128 == 0:
        # lane-packed kernel: full-density DMAs (the natural (cap, d)
        # int8 layout lane-pads d<128 blocks, which made the unpacked
        # kernel LOSE to the einsum past 4 blocks: 0.357 vs 0.227 ms
        # @16k d64) and a 128-deep QK contraction
        out = _kernel_decode_packed(q, cache, float(scale), block_k,
                                    interpret)
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
