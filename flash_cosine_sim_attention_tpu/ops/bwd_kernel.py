"""Pallas TPU backward kernels for cosine-sim flash attention.

TPU-native redesign of the reference CUDA backward
(reference: flash_cosine_sim_attention_cuda.cu:1256-1626).  Same math:

  * ``delta = rowsum(dO * O)`` — the dO.O == dP.P identity (README.md:31,
    cu:1272-1334).  Here it is a one-line XLA reduction, fused by the
    compiler; no dedicated preprocess kernel needed.
  * each tile recomputes ``P = exp(scale*qk - scale + bias) * inv_l``
    (cu:1492-1526), then
        dV += P^T dO                  (cu:1534-1540)
        dP  = dO V^T                  (cu:1544-1553)
        dS  = (dP - delta) * P * scale   (cu:1557-1582)
        dK += dS^T Q                  (cu:1590-1596)
        dQ += dS K                    (cu:1600-1610)
        dB += dS                      (cu:1574-1576)

The CUDA kernel accumulates dQ (and single-head-KV dK/dV, and dB) with
global-memory atomicAdd.  TPUs have no HBM atomics — instead the backward is
split so that every output block is owned by exactly one sequential grid
lane:

  * **dQ kernel**: grid (b, h, q_blocks, k_blocks), K innermost; each Q-row
    block accumulates its dQ in f32 VMEM scratch across the K loop.
  * **dKdV kernel**: grid (b, k_blocks, h, q_blocks), (h, q) innermost; each
    K/V block accumulates dK/dV across the Q loop — and, for single-headed
    KV, also across the heads loop (the dK/dV index map ignores ``h`` so the
    VMEM accumulator survives the whole (h, q) sweep; this replaces the
    reference's atomicAdd head-reduction, cu:1613-1619).
  * **dB kernel** (only when a bias is given): grid (bias_dim, q_blocks,
    k_blocks, reduce), where ``reduce`` sweeps the axis the bias is shared
    over (heads for batch-dim bias, batch for head-dim bias); replaces the
    reference's atomicAdd bias accumulation (cu:1574-1576).

All accumulation is f32 regardless of input dtype (the reference keeps
dk/dv in half when possible, cu:1380-1381 — on TPU f32 scratch is free
enough and strictly more accurate).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .blocks import (
    _round_up,
    onepass_bwd_max_seq,
    pick_block_sizes,
    pick_bwd_blocks_t,
    pick_fused_bwd_blocks,
)
from .blocks import vmem_limit as _vmem_limit
from .mxu import make_mm as _make_mm

LOG2E = 1.4426950408889634


def _dq_kernel_t(
    *refs,
    scale, causal, seq_q, seq_k, block_q, bko, bki, has_mask, out_dtype,
    bias_reduce=0,
):
    """Transposed dQ: all tiles in (k-rows, q-lanes) orientation.

    s^T = K Q^T and dP^T = V dO^T keep the unavoidable d-deep contraction
    (half-filled MXU at d=64); dQ^T = K^T dS^T runs at FULL MXU rate
    (contraction bki, lanes block_q) where the row-major kernel's dS @ K
    paid the d-wide-lanes penalty.  Same big-outer-block + sub-tile
    structure as the transposed forward.

    VPU economy: the host pre-scales dO^T and delta^T by inv_l (d-wide /
    1-wide work, fused into neighboring XLA ops), so the per-element tile
    math is just ``ds = exp2(s^T) * (dP'^T - delta')`` — the ``p = e *
    inv_l`` full-tile multiply of the naive form never materializes, and
    inv_l is not even an input.  Causal/edge masking is branched OUTSIDE
    the tile math (``pl.when`` on interior vs diagonal), so interior
    sub-tiles — the majority — run zero iota/compare/select VPU ops.

    When ``bias_reduce`` > 0 the kernel ALSO produces dBias^T, folded into
    this sweep (the tile's ``ds`` IS dS^T == dBias^T) instead of a third
    full recompute pass (the reference accumulates dB in the same tile
    loop via atomicAdd, cu:1574-1576).  The grid becomes
    (bias_dim0, nq, nk, reduce) with the bias's shared axis (batch for a
    per-head bias, heads for a per-batch bias; length ``bias_reduce``)
    INNERMOST, so consecutive grid steps revisit the same dbT output
    block and accumulate in its VMEM buffer; the dq accumulator grows a
    per-reduce-step leading axis to survive the interleaving.
    """
    idx = 0
    qT_ref = refs[idx]; idx += 1          # (1, 1, d, block_q)
    k_ref = refs[idx]; idx += 1           # (1, 1, bko, d)
    v_ref = refs[idx]; idx += 1           # (1, 1, bko, d)
    doT_ref = refs[idx]; idx += 1         # (1, 1, d, block_q), pre * inv_l
    deltaT_ref = refs[idx]; idx += 1      # (1, 1, 1, block_q), pre * inv_l
    mask_ref = None
    biasT_ref = None
    if has_mask:
        mask_ref = refs[idx]; idx += 1    # (1, bko, 1) f32
    has_bias = bias_reduce > 0
    if has_bias:
        biasT_ref = refs[idx]; idx += 1   # (1, bko, block_q) j-major
        dqT_ref, dbT_ref = refs[idx], refs[idx + 1]
        dq_acc, db_acc = refs[idx + 2], refs[idx + 3]
        qi = pl.program_id(1)
        ki = pl.program_id(2)
        nk = pl.num_programs(2)
        ri = pl.program_id(3)             # the bias-shared (reduce) axis
    else:
        dqT_ref, dq_acc = refs[idx], refs[idx + 1]  # acc: (d, block_q) f32
        qi = pl.program_id(2)
        ki = pl.program_id(3)
        nk = pl.num_programs(3)
    seq_len_diff = seq_k - seq_q

    if has_bias:
        @pl.when(ri == 0)
        def _init_db():
            # zero the whole f32 accumulator unconditionally:
            # causal-skipped blocks must land as zeros, and sub-tiles
            # accumulate slices.  dB accumulates in VMEM scratch and hits
            # HBM exactly once, already cast to the bias dtype — storing
            # f32 and casting in XLA cost an extra 536 MB round-trip at
            # the (h, 4096, 4096) headline bias
            db_acc[...] = jnp.zeros_like(db_acc)

        @pl.when(ki == 0)
        def _init():
            dq_acc[ri] = jnp.zeros_like(dq_acc[ri])
    else:
        @pl.when(ki == 0)
        def _init():
            dq_acc[...] = jnp.zeros_like(dq_acc)

    q_last = qi * block_q + block_q - 1 + seq_len_diff
    run = (q_last >= ki * bko) if causal else True

    @pl.when(run)
    def _tile():
        mm = _make_mm(qT_ref.dtype)
        c = scale * LOG2E
        qT = (qT_ref[0, 0].astype(jnp.float32) * c).astype(qT_ref.dtype)
        doT = doT_ref[0, 0]
        delta = deltaT_ref[0, 0]          # (1, block_q), pre-scaled

        # lane-narrowing case count (see fwd_kernel.py): a causal
        # straddling sub-tile starting t columns past the q block's first
        # position only touches q lanes >= t, so its matmuls statically
        # shrink to the lane window [t_granule, block_q) — big lane blocks
        # stop paying block_q-wide diagonal waste
        ncase = (block_q // bki
                 if causal and block_q > bki and block_q % bki == 0 else 1)

        n_sub = bko // bki
        for j in range(n_sub):
            col0 = ki * bko + j * bki
            edge_possible = (nk - 1) * bko + (j + 1) * bki > seq_k

            def _sub(masked, off=0, j=j, col0=col0,
                     edge_possible=edge_possible):
                w = block_q - off                  # static lane window
                kj = k_ref[0, 0, j * bki:(j + 1) * bki]       # (bki, d)
                vj = v_ref[0, 0, j * bki:(j + 1) * bki]       # (bki, d)
                if off:
                    # windowed operands are re-loaded from the refs, NOT
                    # lane-sliced from the full-width registers: a
                    # register value with a lane offset trips a Mosaic
                    # "Invalid input layout" on the (1, w) -> (bki, w)
                    # broadcast (and a fresh VMEM load at a 128-multiple
                    # lane offset is free — the load adjusts its base)
                    qT_w = (qT_ref[0, 0, :, off:].astype(jnp.float32)
                            * c).astype(qT_ref.dtype)
                    doT_w = doT_ref[0, 0, :, off:]
                    delta_w = deltaT_ref[0, 0, :, off:]
                else:
                    qT_w, doT_w, delta_w = qT, doT, delta
                sT = mm(kj, qT_w, (((1,), (0,)), ((), ())))    # (bki, w)
                if has_bias:
                    sT = sT + biasT_ref[
                        0, j * bki:(j + 1) * bki, off:
                    ].astype(jnp.float32) * LOG2E
                dpT = mm(vj, doT_w, (((1,), (0,)), ((), ())))
                ds = jnp.exp2(sT) * (dpT - delta_w)

                keep = None
                col_s = None
                if masked and (edge_possible or causal):
                    col_s = col0 + jax.lax.broadcasted_iota(
                        jnp.int32, (bki, w), 0)
                if masked and edge_possible:
                    keep = col_s < seq_k
                if masked and causal:
                    row = (qi * block_q + off + seq_len_diff
                           + jax.lax.broadcasted_iota(jnp.int32, (bki, w), 1))
                    cc = col_s <= row
                    keep = cc if keep is None else keep & cc
                if has_mask:
                    km = mask_ref[0, j * bki:(j + 1) * bki] > 0
                    keep = km if keep is None else keep & km
                if keep is not None:
                    ds = jnp.where(keep, ds, 0.0)
                if has_bias:
                    # ds IS dS^T == dBias^T for this tile (pre-scale: the
                    # reference, too, accumulates dB before ds *= scale,
                    # cu:1574-1582); q-lane bounds need no mask — OOB
                    # lanes are cropped at the block write-back
                    db_acc[j * bki:(j + 1) * bki, off:] += ds
                # K's OOB rows multiply only zeroed ds rows, but garbage
                # can be non-finite: zero them.  NOT gated on seq_k % bki:
                # an explicit outer block override can over-cover
                # (nk * bko > seq_k) with bki | seq_k, leaving whole
                # sub-tiles OOB
                if masked and edge_possible:
                    k_rows = col0 + jax.lax.broadcasted_iota(
                        jnp.int32, (bki, 1), 0)
                    kj = jnp.where(k_rows < seq_k, kj, jnp.zeros_like(kj))

                dq_upd = mm(kj, ds.astype(kj.dtype),
                            (((0,), (0,)), ((), ())))          # (d, w)
                if has_bias:
                    dq_acc[ri, :, off:] += dq_upd
                else:
                    dq_acc[:, off:] += dq_upd

            # static: can this j's sub-tile ever touch the sequence edge?
            if causal:
                # three-way branch on the (traced) diagonal position:
                # fully-above -> skip; straddling -> masked math (one case
                # per bki-granule of the diagonal offset t, each with a
                # statically-narrowed lane window); fully-below -> fast
                # path with no mask ops at all
                sub_interior = col0 + bki - 1 <= (
                    qi * block_q + seq_len_diff)
                sub_visible = q_last >= col0
                straddle = sub_visible & jnp.logical_not(sub_interior)
                if ncase == 1:
                    pl.when(straddle)(lambda: _sub(True))
                else:
                    t = col0 - (qi * block_q + seq_len_diff)
                    # cs >= 1 cases imply straddle: t >= bki rules out
                    # interior (needs t <= 1 - bki), t < block_q is
                    # exactly sub_visible
                    pl.when(straddle & (t < bki))(lambda: _sub(True))
                    for cs in range(1, ncase):
                        pl.when((t >= cs * bki) & (t < (cs + 1) * bki))(
                            functools.partial(_sub, True, cs * bki))
                if edge_possible:
                    pl.when(sub_interior)(lambda: _sub(True))
                else:
                    pl.when(sub_interior)(lambda: _sub(False))
            elif edge_possible:
                _sub(True)
            else:
                _sub(False)

    if has_bias:
        @pl.when(ki == nk - 1)
        def _finalize():
            # the dq output block's index changes every step (reduce is
            # innermost), so Pallas writes the buffer back each step; only
            # the LAST visit of each (reduce, qi) block — here, ki == nk-1
            # — must hold the finished dq, and it does
            dqT_ref[0, 0] = (dq_acc[ri] * scale).astype(out_dtype)

        nr = pl.num_programs(3)

        @pl.when(ri == nr - 1)
        def _store_db():
            # one HBM store per (ki, qi) block, in the bias dtype
            dbT_ref[0] = db_acc[...].astype(dbT_ref.dtype)
    else:
        @pl.when(ki == nk - 1)
        def _finalize():
            dqT_ref[0, 0] = (dq_acc[...] * scale).astype(out_dtype)


def _dkdv_kernel_t(
    *refs,
    scale, causal, seq_q, seq_k, block_k, bqo, bqi, has_mask, has_bias,
    q_per_kv, out_dtype, narrow=False,
):
    """Transposed dKdV: tiles in (k-rows, q-lanes) orientation.

    dV^T = dO^T P^T and dK^T = Q^T dS^T run at FULL MXU rate (the
    row-major versions' P^T dO / dS^T Q paid d-wide output lanes); only
    the s^T / dP^T recomputes keep the d-deep contraction penalty.
    Grid (b, nk, h, nq_outer) with (h, q) innermost so a KV head's
    accumulators survive its whole query-head group (GQA / MQA).

    Like the dQ kernel, dO^T/delta^T arrive pre-scaled by inv_l, so
    P never materializes: dV consumes exp2(s^T) directly
    (dV = sum_q (dO*inv_l)[q] e[k,q] == sum_q dO[q] P[k,q]) and
    ``ds = e * (dP'^T - delta')``.  Interior sub-tiles branch past all
    mask construction.
    """
    idx = 0
    qT_ref = refs[idx]; idx += 1          # (1, 1, d, bqo)
    k_ref = refs[idx]; idx += 1           # (1, 1, block_k, d)
    v_ref = refs[idx]; idx += 1           # (1, 1, block_k, d)
    doT_ref = refs[idx]; idx += 1         # (1, 1, d, bqo), pre * inv_l
    deltaT_ref = refs[idx]; idx += 1      # (1, 1, 1, bqo), pre * inv_l
    mask_ref = None
    biasT_ref = None
    if has_mask:
        mask_ref = refs[idx]; idx += 1    # (1, block_k, 1)
    if has_bias:
        biasT_ref = refs[idx]; idx += 1   # (1, block_k, bqo) j-major
    dkT_ref, dvT_ref, dk_acc, dv_acc = refs[idx : idx + 4]  # (d, block_k)

    # grid = (b, k_blocks, h, q_outer_blocks)
    ki = pl.program_id(1)
    hi = pl.program_id(2)
    qi = pl.program_id(3)
    nq = pl.num_programs(3)
    seq_len_diff = seq_k - seq_q

    is_first = (qi == 0) & ((hi % q_per_kv == 0) if q_per_kv > 1 else True)
    is_last = (qi == nq - 1) & (
        (hi % q_per_kv == q_per_kv - 1) if q_per_kv > 1 else True)

    @pl.when(is_first)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    # the whole outer q block is above the diagonal -> nothing to do
    run = (qi * bqo + bqo - 1 + seq_len_diff >= ki * block_k) \
        if causal else True

    @pl.when(run)
    def _tile():
        mm = _make_mm(qT_ref.dtype)
        c = scale * LOG2E
        k = k_ref[0, 0]                   # (block_k, d)

        # lane-narrowing case count for the straddling causal sub-tile
        # (see fwd_kernel.py): a tile starting t > 0 columns past the q
        # sub-tile's first position only has valid q lanes >= t, and here
        # q lanes are the CONTRACTION axis of the dv/dk accumulation, so
        # narrowing shrinks all four matmuls with no accumulator offset.
        # One case per `gran` lanes, at most 4 cases (code-size bound).
        # Unlike the fwd/dQ narrowing (inert at the default blocks), this
        # WOULD change the default kernel, so it stays behind
        # FCSA_DKDV_NARROW=1 until measured on hardware.
        gran = max(128, bqi // 4)
        ncase = bqi // gran if narrow and causal and bqi > gran \
            and bqi % gran == 0 else 1

        n_sub = bqo // bqi
        for j in range(n_sub):
            q0 = qi * bqo + j * bqi
            q_edge = (nq - 1) * bqo + (j + 1) * bqi > seq_q

            def _sub(masked, lo=0, j=j, q0=q0, q_edge=q_edge):
                w = bqi - lo                       # static lane window
                sl = slice(j * bqi + lo, (j + 1) * bqi)
                qTj_raw = qT_ref[0, 0, :, sl]                 # (d, w)
                doTj = doT_ref[0, 0, :, sl]
                if masked and q_edge:
                    # zero Q/dO's OOB lanes: they CONTRACT into dk/dv and
                    # 0 * garbage = NaN otherwise.  NOT gated on
                    # seq_q % bqi: an explicit outer block override can
                    # over-cover (nq * bqo > seq_q) with bqi | seq_q,
                    # leaving whole sub-tiles OOB
                    lane_q = q0 + lo + jax.lax.broadcasted_iota(
                        jnp.int32, (1, w), 1)
                    in_b = lane_q < seq_q
                    qTj_raw = jnp.where(in_b, qTj_raw,
                                        jnp.zeros_like(qTj_raw))
                    doTj = jnp.where(in_b, doTj, jnp.zeros_like(doTj))
                qTj = (qTj_raw.astype(jnp.float32) * c).astype(qT_ref.dtype)
                delta = deltaT_ref[0, 0, :, sl]

                sT = mm(k, qTj,
                        (((1,), (0,)), ((), ())))             # (block_k, w)
                if has_bias:
                    sT = sT + biasT_ref[
                        0, :, sl
                    ].astype(jnp.float32) * LOG2E
                dpT = mm(v_ref[0, 0], doTj, (((1,), (0,)), ((), ())))
                e = jnp.exp2(sT)
                ds = e * (dpT - delta)

                # q-side bounds: OOB q lanes carry garbage delta/dO
                # (possibly non-finite) that would poison dk/dv through
                # the contraction over q
                keep = None
                row_q = None
                if masked and (q_edge or causal):
                    row_q = q0 + lo + jax.lax.broadcasted_iota(
                        jnp.int32, (block_k, w), 1)
                if masked and q_edge:
                    keep = row_q < seq_q
                if masked and causal:
                    col_k = ki * block_k + jax.lax.broadcasted_iota(
                        jnp.int32, (block_k, w), 0)
                    cc = col_k <= row_q + seq_len_diff
                    keep = cc if keep is None else keep & cc
                if has_mask:
                    km = mask_ref[0] > 0                      # (block_k, 1)
                    keep = km if keep is None else keep & km
                if keep is not None:
                    p2 = jnp.where(keep, e, 0.0)
                    ds2 = jnp.where(keep, ds, 0.0)
                else:
                    p2, ds2 = e, ds

                dv_acc[...] += mm(doTj, p2.astype(doTj.dtype),
                                  (((1,), (1,)), ((), ())))   # (d, block_k)
                dk_acc[...] += mm(qTj_raw, ds2.astype(qTj_raw.dtype),
                                  (((1,), (1,)), ((), ())))   # (d, block_k)

            if causal:
                # three-way: q sub-tiles whose LAST row is above this k
                # block see nothing; straddling tiles mask (narrowed to
                # their valid lane window when t > 0); tiles whose FIRST
                # row already sees the whole k block skip mask ops
                sub_interior = (ki * block_k + block_k - 1
                                <= q0 + seq_len_diff)
                sub_visible = q0 + bqi - 1 + seq_len_diff >= ki * block_k
                straddle = sub_visible & jnp.logical_not(sub_interior)
                if ncase == 1:
                    pl.when(straddle)(lambda: _sub(True))
                else:
                    t = ki * block_k - (q0 + seq_len_diff)
                    # lanes < t have no visible k row (col_k >= t + q0 +
                    # diff > q_pos for all of them), so the window
                    # [floor(t/gran)*gran, bqi) keeps every valid lane;
                    # t <= 0 straddles (k block starts at-or-before the
                    # sub-tile) take the full window
                    pl.when(straddle & (t < gran))(lambda: _sub(True))
                    for cs in range(1, ncase):
                        pl.when(straddle & (t >= cs * gran)
                                & (t < (cs + 1) * gran))(
                            functools.partial(_sub, True, cs * gran))
                if q_edge:
                    pl.when(sub_interior)(lambda: _sub(True))
                else:
                    pl.when(sub_interior)(lambda: _sub(False))
            elif q_edge:
                _sub(True)
            else:
                _sub(False)

    @pl.when(is_last)
    def _finalize():
        dkT_ref[0, 0] = (dk_acc[...] * scale).astype(out_dtype)
        dvT_ref[0, 0] = dv_acc[...].astype(out_dtype)


def _fused_bwd_kernel_t(
    *refs,
    scale, causal, seq_q, seq_k, bqo, bqi, bk, has_mask, out_dtype,
    narrow=0,
):
    """ONE-pass fused backward: dQ + dK + dV from a single recompute sweep.

    The two-pass transposed backward recomputes ``s^T = K Q^T`` and
    ``dP^T = V dO^T`` twice — once per kernel — and those are exactly the
    d-deep HALF-RATE matmuls (the MXU is 128 deep; d=64 fills half).  This
    kernel shares them: per (k-block, q-sub-tile) it runs

        sT  = K Qj^T          (half rate, shared)
        dpT = V dOj^T         (half rate, shared)
        dV^T += dOj^T  P^T    (full rate)
        dK^T += Qj^T  dS^T    (full rate)
        dQj^T += K^T  dS^T    (full rate, contraction over the k block)

    i.e. 5 matmuls where the two passes pay 7, and the eliminated pair is
    the expensive one — a time-weighted ~35% cut (measured two-pass split:
    dQ 1.21 + dKdV 1.50 ms @ bf16 causal 4096).

    Ownership without atomics (the reference accumulates dQ via HBM
    atomicAdd, cu:1600-1610): grid = (b, h, nk) with K OUTER-STREAMED and
    the ENTIRE Q extent VMEM-resident per (b, h) — Q/dO/delta tiles'
    index maps ignore the K grid axis so they are fetched once, and dQ^T
    accumulates in a (d, padded_seq_q) f32 scratch that every k step
    updates at STATIC lane offsets (the sub-tile loop is unrolled Python).
    dK/dV accumulate per k block as in the dKdV kernel.  The residency
    requirement is the path's one limit: it gates on seq_q (default cap
    8192, FCSA_ONEPASS_MAX_SEQ) and longer sequences take the two-pass
    kernels.  HBM traffic is optimal: Q/dO/K/V read once, dQ/dK/dV
    written once.

    GQA runs per-QUERY-head (out dk/dv carry h heads) and the group
    reduction happens outside in XLA f32 — the two-pass kernel's
    cross-head VMEM accumulation would need the heads axis inside the k
    grid axis, which would evict the resident Q tiles per head instead.
    """
    idx = 0
    qT_ref = refs[idx]; idx += 1          # (1, 1, d, bqo) resident
    k_ref = refs[idx]; idx += 1           # (1, 1, bk, d)
    v_ref = refs[idx]; idx += 1           # (1, 1, bk, d)
    doT_ref = refs[idx]; idx += 1         # (1, 1, d, bqo), pre * inv_l
    deltaT_ref = refs[idx]; idx += 1      # (1, 1, 1, bqo), pre * inv_l
    mask_ref = None
    if has_mask:
        mask_ref = refs[idx]; idx += 1    # (1, bk, 1) f32
    dqT_ref, dkT_ref, dvT_ref = refs[idx : idx + 3]
    dq_acc, dk_acc, dv_acc = refs[idx + 3 : idx + 6]

    ki = pl.program_id(2)
    nk = pl.num_programs(2)
    seq_len_diff = seq_k - seq_q
    k_ragged = seq_k % bk != 0            # only the LAST k block pads
    q_ragged = seq_q % bqi != 0           # only the LAST q sub-tile pads

    @pl.when(ki == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    dk_acc[...] = jnp.zeros_like(dk_acc)
    dv_acc[...] = jnp.zeros_like(dv_acc)

    mm = _make_mm(qT_ref.dtype)
    c = scale * LOG2E
    k = k_ref[0, 0]                       # (bk, d)
    v = v_ref[0, 0]

    n_sub = bqo // bqi
    for j in range(n_sub):
        q0 = j * bqi                      # STATIC: q is fully resident
        q_edge = (j + 1) * bqi > seq_q    # static: only the last sub-tile

        def _sub(masked, off=0, j=j, q0=q0, q_edge=q_edge):
            # ``off`` statically narrows the q-lane window to
            # [q0+off, q0+bqi): a causal straddle whose diagonal starts t
            # lanes into the sub-tile has its first t lanes fully masked,
            # so the per-granule cases below skip their matmul work
            # entirely (same lane-narrowing as _dq_kernel_t)
            w = bqi - off
            sl = slice(j * bqi + off, (j + 1) * bqi)
            qTj_raw = qT_ref[0, 0, :, sl]                 # (d, w)
            doTj = doT_ref[0, 0, :, sl]
            if masked and q_edge and q_ragged:
                # zero Q/dO's OOB lanes: they CONTRACT into dk/dv and
                # 0 * garbage = NaN otherwise
                lane_q = q0 + off + jax.lax.broadcasted_iota(
                    jnp.int32, (1, w), 1)
                in_b = lane_q < seq_q
                qTj_raw = jnp.where(in_b, qTj_raw, jnp.zeros_like(qTj_raw))
                doTj = jnp.where(in_b, doTj, jnp.zeros_like(doTj))
            qTj = (qTj_raw.astype(jnp.float32) * c).astype(qT_ref.dtype)
            delta = deltaT_ref[0, 0, :, sl]               # (1, w)

            sT = mm(k, qTj, (((1,), (0,)), ((), ())))     # (bk, w)
            dpT = mm(v, doTj, (((1,), (0,)), ((), ())))
            e = jnp.exp2(sT)
            ds = e * (dpT - delta)

            keep = None
            row_q = None
            if masked and (q_edge or causal):
                row_q = q0 + off + jax.lax.broadcasted_iota(
                    jnp.int32, (bk, w), 1)
            if masked and q_edge and q_ragged:
                keep = row_q < seq_q
            col_k = None
            if masked and (causal or k_ragged):
                col_k = ki * bk + jax.lax.broadcasted_iota(
                    jnp.int32, (bk, w), 0)
            if masked and k_ragged:
                # OOB k rows CONTRACT into dq (and carry garbage s/dp)
                kb = col_k < seq_k
                keep = kb if keep is None else keep & kb
            if masked and causal:
                cc = col_k <= row_q + seq_len_diff
                keep = cc if keep is None else keep & cc
            if has_mask:
                km = mask_ref[0] > 0                      # (bk, 1)
                keep = km if keep is None else keep & km
            if keep is not None:
                p2 = jnp.where(keep, e, 0.0)
                ds2 = jnp.where(keep, ds, 0.0)
            else:
                p2, ds2 = e, ds

            dv_acc[...] += mm(doTj, p2.astype(doTj.dtype),
                              (((1,), (1,)), ((), ())))   # (d, bk)
            dk_acc[...] += mm(qTj_raw, ds2.astype(qTj_raw.dtype),
                              (((1,), (1,)), ((), ())))   # (d, bk)
            kz = k
            if masked and k_ragged:
                # zeroed ds rows hit K's OOB rows in the dq contraction;
                # 0 * non-finite garbage would still poison dq
                k_rows = ki * bk + jax.lax.broadcasted_iota(
                    jnp.int32, (bk, 1), 0)
                kz = jnp.where(k_rows < seq_k, k, jnp.zeros_like(k))
            dq_acc[:, sl] += mm(kz, ds2.astype(kz.dtype),
                                (((0,), (0,)), ((), ())))  # (d, w)

        if causal:
            # three-way per q sub-tile (k block is the traced side): above
            # the diagonal -> skip; straddling -> masked; interior -> fast
            # path (masked only for the ragged last q sub-tile, whose OOB
            # lanes need zeroing even below the diagonal).  The padded
            # last k block can never be causal-interior (its last row
            # index >= seq_k > any visible q position), so the k-edge
            # masking rides the straddle branch.
            sub_interior = ki * bk + bk - 1 <= q0 + seq_len_diff
            sub_visible = q0 + bqi - 1 + seq_len_diff >= ki * bk
            straddle = sub_visible & jnp.logical_not(sub_interior)
            if narrow and bqi > narrow and bqi % narrow == 0:
                # per-granule lane-narrowed straddle cases: the diagonal
                # starts t lanes into the sub-tile; lanes < t are fully
                # masked, so case c runs the window [c*narrow, bqi).
                # t >= narrow rules out interior (interior needs t < 0)
                # and t < bqi is exactly sub_visible, so the c >= 1 cases
                # imply straddle on their own
                t = ki * bk - (q0 + seq_len_diff)
                pl.when(straddle & (t < narrow))(lambda: _sub(True))
                for cs in range(1, bqi // narrow):
                    pl.when((t >= cs * narrow)
                            & (t < (cs + 1) * narrow))(
                        functools.partial(_sub, True, cs * narrow))
            else:
                pl.when(straddle)(lambda: _sub(True))
            interior_masked = q_edge and q_ragged
            pl.when(sub_interior)(
                functools.partial(_sub, interior_masked))
        elif (q_edge and q_ragged) or k_ragged:
            _sub(True)
        else:
            _sub(False)

    dkT_ref[0, 0] = (dk_acc[...] * scale).astype(out_dtype)
    dvT_ref[0, 0] = dv_acc[...].astype(out_dtype)

    @pl.when(ki == nk - 1)
    def _finalize():
        dqT_ref[0, 0] = (dq_acc[...] * scale).astype(out_dtype)


def _backward_fused(
    do, o, inv_l, q, k, v, mask, *, scale, causal, interpret,
    blocks_f=None,
):
    """Launch the one-pass fused backward; returns (dq, dk, dv).

    ``blocks_f`` = (bk, bqi) override for the sweep harness.
    """
    b, h, seq_q, d = q.shape
    kvh = k.shape[1]
    seq_k = k.shape[2]
    q_per_kv = h // kvh

    bk, bqi = blocks_f or pick_fused_bwd_blocks(q.dtype, d, seq_q, seq_k,
                                                causal=causal)
    bqo = _round_up(seq_q, bqi)           # whole q extent, one padded block
    nk = pl.cdiv(seq_k, bk)

    # host-side pre-scaling (see _backward_transposed): P = e * inv_l
    # never materializes in the kernel
    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1,
        keepdims=True)
    deltaT = (delta * inv_l).swapaxes(-1, -2)        # (b, h, 1, i)
    qT = q.swapaxes(-1, -2)                          # (b, h, d, i)
    doT = (do.astype(jnp.float32) * inv_l).astype(do.dtype)\
        .swapaxes(-1, -2)                            # (b, h, d, i)

    has_mask = mask is not None
    mask_s = mask.astype(jnp.float32)[:, :, None] if has_mask else None
    kv_head = (lambda hi: hi) if kvh == h else (lambda hi: hi // q_per_kv)

    in_specs = [
        pl.BlockSpec((1, 1, d, bqo), lambda bi, hi, ki: (bi, hi, 0, 0)),
        pl.BlockSpec((1, 1, bk, d),
                     lambda bi, hi, ki: (bi, kv_head(hi), ki, 0)),
        pl.BlockSpec((1, 1, bk, d),
                     lambda bi, hi, ki: (bi, kv_head(hi), ki, 0)),
        pl.BlockSpec((1, 1, d, bqo), lambda bi, hi, ki: (bi, hi, 0, 0)),
        pl.BlockSpec((1, 1, 1, bqo), lambda bi, hi, ki: (bi, hi, 0, 0)),
    ]
    args = [qT, k, v, doT, deltaT]
    if has_mask:
        args.append(mask_s)
        in_specs.append(
            pl.BlockSpec((1, bk, 1), lambda bi, hi, ki: (bi, ki, 0)))

    # GQA: dk/dv come out PER QUERY HEAD and reduce over the group in f32
    # outside (see kernel docstring); MHA (kvh == h) writes directly.
    kv_out_spec = pl.BlockSpec(
        (1, 1, d, bk), lambda bi, hi, ki: (bi, hi, 0, ki))
    dqT, dkT, dvT = pl.pallas_call(
        functools.partial(
            _fused_bwd_kernel_t, scale=float(scale), causal=causal,
            seq_q=seq_q, seq_k=seq_k, bqo=bqo, bqi=bqi, bk=bk,
            has_mask=has_mask, out_dtype=q.dtype,
            # lane-narrowing granule for causal straddle sub-tiles
            # (0 = off; A/B hook, see the kernel's straddle cases)
            narrow=int(os.environ.get("FCSA_FB_NARROW", "0"))),
        grid=(b, h, nk),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, d, bqo), lambda bi, hi, ki: (bi, hi, 0, 0)),
            kv_out_spec,
            kv_out_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, d, seq_q), q.dtype),
            jax.ShapeDtypeStruct((b, h, d, seq_k), k.dtype),
            jax.ShapeDtypeStruct((b, h, d, seq_k), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((d, bqo), jnp.float32),
            pltpu.VMEM((d, bk), jnp.float32),
            pltpu.VMEM((d, bk), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(),
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*args)

    dq = dqT.swapaxes(-1, -2)
    dk = dkT.swapaxes(-1, -2)
    dv = dvT.swapaxes(-1, -2)
    if kvh != h:
        dk = dk.reshape(b, kvh, q_per_kv, seq_k, d)\
            .astype(jnp.float32).sum(axis=2).astype(k.dtype)
        dv = dv.reshape(b, kvh, q_per_kv, seq_k, d)\
            .astype(jnp.float32).sum(axis=2).astype(v.dtype)
    return dq, dk, dv


def _recompute_p_and_ds(
    *,
    s,                 # (rows, cols) f32 raw q.k scores layout-agnostic
    inv_l,             # broadcastable to s: inverse rowsums along q axis
    delta,             # broadcastable to s: rowsum(do*o) along q axis
    dp,                # (rows, cols) f32 = dO V^T in the same layout as s
    bias,              # broadcastable bias or None (f32)
    keep,              # bool mask broadcastable to s
    scale: float,
):
    """Shared tile math: P from recomputation, then dS (cu:1492-1582).

    ``keep`` is applied LAST: OOB-padded blocks carry garbage (possibly
    NaN/Inf) in s/bias/inv_l/delta/dp, and zeroing e early would still let
    ``0 * NaN`` poison p/ds.  Masking the final products guarantees masked
    entries are exactly 0 regardless of the garbage upstream.
    """
    # exp2 with log2(e) pre-folded into the compile-time scale; the
    # ``- scale`` shift is dropped to match the forward's exp-weight
    # convention (see fwd_kernel.py: inv_l absorbs the constant factor,
    # so P = e * inv_l is unchanged)
    log2e = 1.4426950408889634
    logits2 = s * (scale * log2e)
    if bias is not None:
        logits2 = logits2 + bias * log2e
    e = jnp.exp2(logits2)
    p = e * inv_l
    # raw dS (the bias gradient): scale enters only on the q.k path, so
    # dQ/dK use ds*scale while dB uses ds as-is (the reference accumulates
    # db BEFORE the ds *= scale step, cu:1574-1582)
    ds = p * (dp - delta)
    if keep is not None:  # interior fast path w/o key mask passes None
        p = jnp.where(keep, p, 0.0)
        ds = jnp.where(keep, ds, 0.0)
    return p, ds


def _backward_transposed(
    do, o, inv_l, q, k, v, mask, bias=None, *, scale, causal,
    block_q, block_k, interpret, bias_batch_dim=False,
    blocks_t=None, blocks_t_kv=None,
):
    """Transposed backward; returns (dq, dk, dv, db_or_None).

    With a bias, dB^T is folded into the dQ kernel's sweep (it already
    computes every dS^T tile — see _dq_kernel_t) instead of a third full
    recompute pass; the bias itself rides as a one-time j-major relayout
    shared by both kernels (CSE'd with the forward's inside one jit).

    ``blocks_t`` / ``blocks_t_kv`` override the (owned, outer, inner)
    block triples of the dQ / dKdV kernels directly (sweep harness hook);
    otherwise ``block_q``/``block_k`` keep their public row-major meaning
    on top of the tuned table.
    """
    b, h, seq_q, d = q.shape
    kvh = k.shape[1]
    seq_k = k.shape[2]
    q_per_kv = h // kvh
    has_bias = bias is not None
    # the bias's shared axis (reduced into dB): batch for a per-head
    # bias, heads for a per-batch bias
    bias_reduce = (h if bias_batch_dim else b) if has_bias else 0

    bo_d, bko_d, bki_d = pick_bwd_blocks_t(
        q.dtype, d, seq_q, seq_k, has_bias=has_bias, which="dq")
    if blocks_t is not None:
        bo_d, bko_d, bki_d = blocks_t
    bq = block_q or bo_d           # dQ's owned block (lane width)
    bko = block_k or bko_d         # streamed outer block
    bki = min(block_k or bki_d, bko)
    if bko % bki:
        bki = bko  # remainder sub-tiles would drop columns
    # dKdV's own triple: (owned k lanes, outer q stream, inner q sub-tile)
    if blocks_t_kv is not None:
        kv_o, kv_bko, kv_bki = blocks_t_kv
    elif blocks_t is not None or block_q or block_k:
        kv_o, kv_bko, kv_bki = bq, bko, bki  # legacy: shared override
    else:
        kv_o, kv_bko, kv_bki = pick_bwd_blocks_t(
            q.dtype, d, seq_k, seq_q, has_bias=has_bias, which="dkdv")
    kv_bki = min(kv_bki, kv_bko)
    if kv_bko % kv_bki:
        kv_bki = kv_bko
    bk_own = kv_o                  # dKdV's owned k block (lanes)
    nq = pl.cdiv(seq_q, bq)
    nk = pl.cdiv(seq_k, bko)
    nko = pl.cdiv(seq_k, bk_own)
    nqo = pl.cdiv(seq_q, kv_bko)   # dKdV streams q in kv_bko-outer blocks

    # pre-scale dO and delta by inv_l on the host side (fused XLA
    # elementwise, O(n*d) work): P = e * inv_l then never materializes in
    # the kernels — ds = e * (dP' - delta') and dV consumes e directly —
    # saving a full-tile VPU multiply per sub-tile in BOTH kernels and the
    # whole inv_l input stream
    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1,
        keepdims=True)
    deltaT = (delta * inv_l).swapaxes(-1, -2)        # (b, h, 1, i)
    qT = q.swapaxes(-1, -2)                          # (b, h, d, i)
    doT = (do.astype(jnp.float32) * inv_l).astype(do.dtype)\
        .swapaxes(-1, -2)                            # (b, h, d, i)

    has_mask = mask is not None
    mask_s = mask.astype(jnp.float32)[:, :, None] if has_mask else None
    biasT = bias.swapaxes(-1, -2) if has_bias else None  # (b|h, j, i)
    kv_head = (lambda hi: hi) if kvh == h else (lambda hi: hi // q_per_kv)
    seq_len_diff = seq_k - seq_q

    # ---- dQ: grid (b, h, nq, nk); causal DMA elision on the K side ----
    # (with a bias: grid (bias_dim0, nq, nk, reduce) — see _dq_kernel_t)
    if causal:
        def clamp_k(qi, ki):
            last_k = jnp.clip(
                (qi * bq + bq - 1 + seq_len_diff) // bko, 0, nk - 1)
            return jnp.minimum(ki, last_k)
    else:
        clamp_k = lambda qi, ki: ki

    if has_bias:
        # map this grid's ids onto (batch, head): the non-shared bias axis
        # leads the grid, the shared one is the innermost reduce
        if bias_batch_dim:
            gb = lambda oi, ri: oi      # bias (b, i, j): reduce over heads
            gh = lambda oi, ri: ri
        else:
            gb = lambda oi, ri: ri      # bias (h, i, j): reduce over batch
            gh = lambda oi, ri: oi
        dq_specs = [
            pl.BlockSpec((1, 1, d, bq),
                         lambda oi, qi, ki, ri: (gb(oi, ri), gh(oi, ri),
                                                 0, qi)),
            pl.BlockSpec((1, 1, bko, d),
                         lambda oi, qi, ki, ri: (gb(oi, ri),
                                                 kv_head(gh(oi, ri)),
                                                 clamp_k(qi, ki), 0)),
            pl.BlockSpec((1, 1, bko, d),
                         lambda oi, qi, ki, ri: (gb(oi, ri),
                                                 kv_head(gh(oi, ri)),
                                                 clamp_k(qi, ki), 0)),
            pl.BlockSpec((1, 1, d, bq),
                         lambda oi, qi, ki, ri: (gb(oi, ri), gh(oi, ri),
                                                 0, qi)),
            pl.BlockSpec((1, 1, 1, bq),
                         lambda oi, qi, ki, ri: (gb(oi, ri), gh(oi, ri),
                                                 0, qi)),
        ]
        dq_args = [qT, k, v, doT, deltaT]
        if has_mask:
            dq_args.append(mask_s)
            dq_specs.append(
                pl.BlockSpec((1, bko, 1),
                             lambda oi, qi, ki, ri: (gb(oi, ri),
                                                     clamp_k(qi, ki), 0)))
        dq_args.append(biasT)
        dq_specs.append(
            pl.BlockSpec((1, bko, bq),
                         lambda oi, qi, ki, ri: (oi, clamp_k(qi, ki), qi)))

        dqT, dbT = pl.pallas_call(
            functools.partial(
                _dq_kernel_t, scale=float(scale), causal=causal,
                seq_q=seq_q, seq_k=seq_k, block_q=bq, bko=bko, bki=bki,
                has_mask=has_mask, out_dtype=q.dtype,
                bias_reduce=bias_reduce),
            grid=(biasT.shape[0], nq, nk, bias_reduce),
            in_specs=dq_specs,
            out_specs=[
                pl.BlockSpec((1, 1, d, bq),
                             lambda oi, qi, ki, ri: (gb(oi, ri),
                                                     gh(oi, ri), 0, qi)),
                # NOT k-clamped: every (ki, qi) owns a distinct dB^T block
                pl.BlockSpec((1, bko, bq),
                             lambda oi, qi, ki, ri: (oi, ki, qi)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, h, d, seq_q), q.dtype),
                # dB^T lands pre-cast to the bias dtype (f32 accumulation
                # stays in the kernel's VMEM scratch)
                jax.ShapeDtypeStruct((biasT.shape[0], seq_k, seq_q),
                                     bias.dtype),
            ],
            scratch_shapes=[pltpu.VMEM((bias_reduce, d, bq), jnp.float32),
                            pltpu.VMEM((bko, bq), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(),
                dimension_semantics=("parallel", "parallel", "arbitrary",
                                     "arbitrary")),
            interpret=interpret,
        )(*dq_args)
        db = dbT.swapaxes(-1, -2).astype(bias.dtype)
    else:
        db = None
        dq_specs = [
            pl.BlockSpec((1, 1, d, bq),
                         lambda bi, hi, qi, ki: (bi, hi, 0, qi)),
            pl.BlockSpec((1, 1, bko, d),
                         lambda bi, hi, qi, ki: (bi, kv_head(hi),
                                                 clamp_k(qi, ki), 0)),
            pl.BlockSpec((1, 1, bko, d),
                         lambda bi, hi, qi, ki: (bi, kv_head(hi),
                                                 clamp_k(qi, ki), 0)),
            pl.BlockSpec((1, 1, d, bq),
                         lambda bi, hi, qi, ki: (bi, hi, 0, qi)),
            pl.BlockSpec((1, 1, 1, bq),
                         lambda bi, hi, qi, ki: (bi, hi, 0, qi)),
        ]
        dq_args = [qT, k, v, doT, deltaT]
        if has_mask:
            dq_args.append(mask_s)
            dq_specs.append(
                pl.BlockSpec((1, bko, 1),
                             lambda bi, hi, qi, ki: (bi, clamp_k(qi, ki),
                                                     0)))

        dqT = pl.pallas_call(
            functools.partial(
                _dq_kernel_t, scale=float(scale), causal=causal,
                seq_q=seq_q, seq_k=seq_k, block_q=bq, bko=bko, bki=bki,
                has_mask=has_mask, out_dtype=q.dtype),
            grid=(b, h, nq, nk),
            in_specs=dq_specs,
            out_specs=pl.BlockSpec(
                (1, 1, d, bq), lambda bi, hi, qi, ki: (bi, hi, 0, qi)),
            out_shape=jax.ShapeDtypeStruct((b, h, d, seq_q), q.dtype),
            scratch_shapes=[pltpu.VMEM((d, bq), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(),
                dimension_semantics=("parallel", "parallel", "parallel",
                                     "arbitrary")),
            interpret=interpret,
        )(*dq_args)

    # ---- dKdV: grid (b, nko, h, nqo); elide q blocks above diagonal ----
    if causal:
        def clamp_q(ki, qi):
            first_q = jnp.clip(
                (ki * bk_own - seq_len_diff) // kv_bko, 0, nqo - 1)
            return jnp.maximum(qi, first_q)
    else:
        clamp_q = lambda ki, qi: qi

    dkv_specs = [
        pl.BlockSpec((1, 1, d, kv_bko),
                     lambda bi, ki, hi, qi: (bi, hi, 0, clamp_q(ki, qi))),
        pl.BlockSpec((1, 1, bk_own, d),
                     lambda bi, ki, hi, qi: (bi, kv_head(hi), ki, 0)),
        pl.BlockSpec((1, 1, bk_own, d),
                     lambda bi, ki, hi, qi: (bi, kv_head(hi), ki, 0)),
        pl.BlockSpec((1, 1, d, kv_bko),
                     lambda bi, ki, hi, qi: (bi, hi, 0, clamp_q(ki, qi))),
        pl.BlockSpec((1, 1, 1, kv_bko),
                     lambda bi, ki, hi, qi: (bi, hi, 0, clamp_q(ki, qi))),
    ]
    dkv_args = [qT, k, v, doT, deltaT]
    if has_mask:
        dkv_args.append(mask_s)
        dkv_specs.append(
            pl.BlockSpec((1, bk_own, 1),
                         lambda bi, ki, hi, qi: (bi, ki, 0)))
    if has_bias:
        bias_dim = (lambda bi, hi: bi) if bias_batch_dim \
            else (lambda bi, hi: hi)
        dkv_args.append(biasT)
        dkv_specs.append(
            pl.BlockSpec((1, bk_own, kv_bko),
                         lambda bi, ki, hi, qi: (bias_dim(bi, hi), ki,
                                                 clamp_q(ki, qi))))

    kv_out_spec = pl.BlockSpec(
        (1, 1, d, bk_own), lambda bi, ki, hi, qi: (bi, kv_head(hi), 0, ki))
    dkT, dvT = pl.pallas_call(
        functools.partial(
            _dkdv_kernel_t, scale=float(scale), causal=causal, seq_q=seq_q,
            seq_k=seq_k, block_k=bk_own, bqo=kv_bko, bqi=kv_bki,
            has_mask=has_mask, has_bias=has_bias, q_per_kv=q_per_kv,
            out_dtype=k.dtype,
            narrow=os.environ.get("FCSA_DKDV_NARROW", "0") == "1"),
        grid=(b, nko, h, nqo),
        in_specs=dkv_specs,
        out_specs=[kv_out_spec, kv_out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, kvh, d, seq_k), k.dtype),
            jax.ShapeDtypeStruct((b, kvh, d, seq_k), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((d, bk_own), jnp.float32),
            pltpu.VMEM((d, bk_own), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(),
            dimension_semantics=(
                "parallel", "parallel",
                "parallel" if q_per_kv == 1 else "arbitrary",
                "arbitrary")),
        interpret=interpret,
    )(*dkv_args)

    return (dqT.swapaxes(-1, -2), dkT.swapaxes(-1, -2),
            dvT.swapaxes(-1, -2), db)


def _dq_kernel(
    *refs,
    scale, causal, seq_q, seq_k, block_q, block_k, has_mask, has_bias, out_dtype,
    precision,
):
    idx = 0
    q_ref = refs[idx]; idx += 1
    k_ref = refs[idx]; idx += 1
    v_ref = refs[idx]; idx += 1
    do_ref = refs[idx]; idx += 1
    delta_ref = refs[idx]; idx += 1
    invl_ref = refs[idx]; idx += 1
    mask_ref = bias_ref = None
    if has_mask:
        mask_ref = refs[idx]; idx += 1
    if has_bias:
        bias_ref = refs[idx]; idx += 1
    dq_ref, dq_acc = refs[idx], refs[idx + 1]

    qi = pl.program_id(2)
    ki = pl.program_id(3)
    nk = pl.num_programs(3)
    seq_len_diff = seq_k - seq_q

    @pl.when(ki == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    run = (qi * block_q + block_q - 1 + seq_len_diff >= ki * block_k) \
        if causal else True

    def _tile(masked: bool):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]

        # zero K's OOB rows: ds columns there are masked to 0, but
        # 0 * garbage = NaN in the dS @ K matmul otherwise
        if masked and seq_k % block_k != 0:
            k_rows = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_k, 1), 0
            )
            k = jnp.where(k_rows < seq_k, k, jnp.zeros_like(k))

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=precision,
        )  # (bq, bk)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=precision,
        )  # (bq, bk)

        keep = None
        if masked:
            row_g = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            col_g = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            keep = (row_g < seq_q) & (col_g < seq_k)
            if causal:
                keep &= col_g <= (row_g + seq_len_diff)
        if has_mask:
            km = mask_ref[0] > 0
            keep = km if keep is None else keep & km

        inv_l = invl_ref[0, 0]   # (block_q, 1)
        delta = delta_ref[0, 0]  # (block_q, 1)
        bias = bias_ref[0].astype(jnp.float32) if has_bias else None

        _, ds = _recompute_p_and_ds(
            s=s, inv_l=inv_l, delta=delta, dp=dp, bias=bias, keep=keep,
            scale=scale,
        )
        # the dS *= scale step (cu:1580-1582) is folded into _finalize:
        # multiplying the (bq, d) accumulator once is 1/(bk/d) the VPU work
        # of scaling every (bq, bk) tile
        dq_acc[...] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )

    # interior fast path (see fwd_kernel.py): bounds/causal epilogue
    # skipped on tiles fully in bounds and fully below the diagonal; the
    # dynamic key mask still applies everywhere
    interior = ((qi + 1) * block_q <= seq_q) & ((ki + 1) * block_k <= seq_k)
    if causal:
        interior &= (ki + 1) * block_k - 1 <= qi * block_q + seq_len_diff

    if seq_q % block_q == 0 and seq_k % block_k == 0 and not causal:
        @pl.when(run)
        def _compute():
            _tile(masked=False)
    else:
        @pl.when(run & interior)
        def _fast():
            _tile(masked=False)

        @pl.when(run & jnp.logical_not(interior))
        def _slow():
            _tile(masked=True)

    @pl.when(ki == nk - 1)
    def _finalize():
        dq_ref[0, 0] = (dq_acc[...] * scale).astype(out_dtype)


def _dkdv_kernel(
    *refs,
    scale, causal, seq_q, seq_k, block_q, block_k, has_mask, has_bias,
    q_per_kv, out_dtype, precision,
):
    idx = 0
    q_ref = refs[idx]; idx += 1
    k_ref = refs[idx]; idx += 1
    v_ref = refs[idx]; idx += 1
    do_ref = refs[idx]; idx += 1
    delta_ref = refs[idx]; idx += 1
    invl_ref = refs[idx]; idx += 1
    mask_ref = bias_ref = None
    if has_mask:
        mask_ref = refs[idx]; idx += 1
    if has_bias:
        bias_ref = refs[idx]; idx += 1
    dk_ref, dv_ref, dk_acc, dv_acc = refs[idx : idx + 4]

    # grid = (b, k_blocks, h, q_blocks)
    ki = pl.program_id(1)
    hi = pl.program_id(2)
    qi = pl.program_id(3)
    nh = pl.num_programs(2)
    nq = pl.num_programs(3)
    seq_len_diff = seq_k - seq_q

    # a K/V head's dk/dv accumulate across its whole query-head group
    # (group size q_per_kv: 1 = MHA, h = single-head KV, between = GQA);
    # group members are adjacent on the (sequential) heads grid axis, so
    # the VMEM accumulator legally persists across them
    is_first = (qi == 0) & ((hi % q_per_kv == 0) if q_per_kv > 1 else True)
    is_last = (qi == nq - 1) & (
        (hi % q_per_kv == q_per_kv - 1) if q_per_kv > 1 else True)

    @pl.when(is_first)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    run = (qi * block_q + block_q - 1 + seq_len_diff >= ki * block_k) \
        if causal else True

    def _tile(masked: bool):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]

        # zero Q/dO OOB rows: p_t/ds_t columns there are masked to 0, but
        # 0 * garbage = NaN in the P^T @ dO and dS^T @ Q matmuls otherwise
        if masked and seq_q % block_q != 0:
            q_rows = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, 1), 0
            )
            in_bounds = q_rows < seq_q
            q = jnp.where(in_bounds, q, jnp.zeros_like(q))
            do = jnp.where(in_bounds, do, jnp.zeros_like(do))

        # transposed layout: rows = K positions, cols = Q positions, so the
        # per-Q-row inv_l / delta broadcast along axis 0 with no relayout
        s_t = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=precision,
        )  # (bk, bq)
        dp_t = jax.lax.dot_general(
            v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=precision,
        )  # (bk, bq)

        keep = None
        if masked:
            krow_g = ki * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_k, block_q), 0
            )
            qcol_g = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_k, block_q), 1
            )
            keep = (krow_g < seq_k) & (qcol_g < seq_q)
            if causal:
                keep &= krow_g <= (qcol_g + seq_len_diff)
        if has_mask:
            km = mask_ref[0, 0] > 0  # (block_k, 1) broadcasts over Q cols
            keep = km if keep is None else keep & km

        inv_l = invl_ref[0, 0]   # (1, bq), broadcasts over K rows
        delta = delta_ref[0, 0]  # (1, bq)
        bias = bias_ref[0].astype(jnp.float32).T if has_bias else None

        p_t, ds_t = _recompute_p_and_ds(
            s=s_t, inv_l=inv_l, delta=delta, dp=dp_t, bias=bias, keep=keep,
            scale=scale,
        )
        # zero dO's OOB rows are already handled: p_t/ds_t cols for OOB q
        # rows are zeroed by `keep`, so garbage dO rows never contribute
        dv_acc[...] += jax.lax.dot_general(
            p_t.astype(do.dtype), do, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        # dS *= scale folded into _finalize (see dq kernel)
        dk_acc[...] += jax.lax.dot_general(
            ds_t.astype(q.dtype), q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )

    # interior fast path, transposed: tile fully in bounds and every K row
    # of the tile visible to every Q column -> last K row <= first Q col;
    # the dynamic key mask still applies everywhere
    interior = ((qi + 1) * block_q <= seq_q) & ((ki + 1) * block_k <= seq_k)
    if causal:
        interior &= (ki + 1) * block_k - 1 <= qi * block_q + seq_len_diff

    if seq_q % block_q == 0 and seq_k % block_k == 0 and not causal:
        @pl.when(run)
        def _compute():
            _tile(masked=False)
    else:
        @pl.when(run & interior)
        def _fast():
            _tile(masked=False)

        @pl.when(run & jnp.logical_not(interior))
        def _slow():
            _tile(masked=True)

    @pl.when(is_last)
    def _finalize():
        dk_ref[0, 0] = (dk_acc[...] * scale).astype(out_dtype)
        dv_ref[0, 0] = dv_acc[...].astype(out_dtype)


def _db_kernel(
    *refs,
    scale, causal, seq_q, seq_k, block_q, block_k, has_mask, out_dtype,
    precision,
):
    idx = 0
    q_ref = refs[idx]; idx += 1
    k_ref = refs[idx]; idx += 1
    v_ref = refs[idx]; idx += 1
    do_ref = refs[idx]; idx += 1
    delta_ref = refs[idx]; idx += 1
    invl_ref = refs[idx]; idx += 1
    mask_ref = None
    if has_mask:
        mask_ref = refs[idx]; idx += 1
    bias_ref = refs[idx]; idx += 1
    db_ref, db_acc = refs[idx], refs[idx + 1]

    # grid = (bias_dim, q_blocks, k_blocks, reduce_axis)
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    ri = pl.program_id(3)
    nr = pl.num_programs(3)
    seq_len_diff = seq_k - seq_q

    @pl.when(ri == 0)
    def _init():
        db_acc[...] = jnp.zeros_like(db_acc)

    run = (qi * block_q + block_q - 1 + seq_len_diff >= ki * block_k) \
        if causal else True

    @pl.when(run)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=precision,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=precision,
        )
        row_g = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0
        )
        col_g = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        keep = (row_g < seq_q) & (col_g < seq_k)
        if causal:
            keep &= col_g <= (row_g + seq_len_diff)
        if has_mask:
            keep &= mask_ref[0] > 0

        inv_l = invl_ref[0, 0]   # (block_q, 1)
        delta = delta_ref[0, 0]  # (block_q, 1)
        bias = bias_ref[0].astype(jnp.float32)

        _, ds = _recompute_p_and_ds(
            s=s, inv_l=inv_l, delta=delta, dp=dp, bias=bias, keep=keep,
            scale=scale,
        )
        db_acc[...] += ds

    @pl.when(ri == nr - 1)
    def _finalize():
        db_ref[0] = db_acc[...].astype(out_dtype)


def flash_attention_backward(
    do: jax.Array,
    o: jax.Array,
    inv_l: jax.Array,             # (b, h, i) f32 inverse rowsums from fwd
    q: jax.Array,                 # (b, h, i, d), l2-normalized
    k: jax.Array,                 # (b, kvh, j, d)
    v: jax.Array,
    mask: Optional[jax.Array],    # (b, j) bool
    bias: Optional[jax.Array],    # (b|h, i, j)
    *,
    bias_batch_dim: bool,
    scale: float,
    causal: bool,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: bool = False,
    blocks_t=None,
    blocks_t_kv=None,
    blocks_f=None,
):
    """Full backward; returns (dq, dk, dv, db_or_None)."""
    b, h, seq_q, d = q.shape
    kvh = k.shape[1]
    seq_k = k.shape[2]
    assert h % kvh == 0, (h, kvh)
    q_per_kv = h // kvh

    # Kernel selection, fastest first:
    #   1. ONE-pass fused dQ+dK+dV (shares the half-rate s^T/dP^T
    #      recomputes — see _fused_bwd_kernel_t): the default whenever its
    #      q-extent VMEM residency holds and no bias rides along.  Any
    #      explicit block override pins the two-pass kernels (that is the
    #      two-pass path's test/sweep hook) unless it IS the fused sweep
    #      hook ``blocks_f``.
    #   2. two-pass transposed kernels (bias folds dB^T into the dQ sweep).
    #   3. row-major kernels + separate dB pass for unusually large bias
    #      reduce axes (VMEM bound on the dB fold's accumulator).
    use_onepass = blocks_f is not None or (
        bias is None
        and blocks_t is None and blocks_t_kv is None
        and block_q is None and block_k is None
        and seq_q <= onepass_bwd_max_seq()
        # causal f32 past 4096 is the one-pass path's measured hole: every
        # swept (bk, bqi) ran 35-41 ms @8192 vs 30.7 for the two-pass
        # kernels (v5e r5) — the predicated causal branches stop
        # overlapping at f32 tile sizes long before the residency cap
        and not (causal and q.dtype == jnp.float32 and seq_q > 4096)
    )
    if use_onepass:
        dq, dk, dv = _backward_fused(
            do, o, inv_l, q, k, v, mask, scale=scale, causal=causal,
            interpret=interpret, blocks_f=blocks_f)
        return dq, dk, dv, None

    # transposed kernels (full-rate dQ^T/dK^T/dV^T matmuls) are the hot
    # path, bias included (dB^T folds into the dQ sweep).  The dB fold's
    # per-reduce-step dq accumulator scales VMEM with the bias's shared
    # axis, so unusually large reduce axes fall back to the row-major
    # kernels + separate dB pass below.
    bias_reduce = 0 if bias is None else (h if bias_batch_dim else b)
    if bias_reduce <= 16:
        dq, dk, dv, db = _backward_transposed(
            do, o, inv_l, q, k, v, mask, bias, scale=scale, causal=causal,
            block_q=block_q, block_k=block_k, interpret=interpret,
            bias_batch_dim=bias_batch_dim,
            blocks_t=blocks_t, blocks_t_kv=blocks_t_kv)
        return dq, dk, dv, db

    bq_d, bk_d = pick_block_sizes(q.dtype, d, seq_q, seq_k, kind="bwd")
    block_q = block_q or bq_d
    block_k = block_k or bk_d
    nq = pl.cdiv(seq_q, block_q)
    nk = pl.cdiv(seq_k, block_k)

    # delta = rowsum(dO . O): the dO.O == dP.P identity (README.md:31);
    # a plain XLA reduction replaces the reference's preprocess kernel.
    # Two layouts: (b,h,i,1) for the q-major kernels (dQ, dB) and (b,h,1,i)
    # for the transposed dKdV kernel, so per-q-row values broadcast onto the
    # score tile with no in-kernel relayout.
    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True
    )  # (b, h, i, 1)
    delta_t = delta.swapaxes(-1, -2)    # (b, h, 1, i)
    inv_l_t = inv_l.swapaxes(-1, -2)    # (b, h, 1, i)

    has_mask = mask is not None
    has_bias = bias is not None
    mask_f = mask.astype(jnp.float32)[:, None, :] if has_mask else None
    precision = (jax.lax.Precision.HIGHEST
                 if q.dtype == jnp.float32 else jax.lax.Precision.DEFAULT)

    kv_head = ((lambda hi: hi) if kvh == h
               else (lambda hi: hi // q_per_kv))

    # Causal DMA elision (see fwd_kernel.py): clamp block indices at the
    # causal boundary so compute-skipped tiles re-use the previously
    # fetched block instead of paying a fresh HBM DMA.
    seq_len_diff = seq_k - seq_q
    if causal:
        def clamp_k(qi, ki):
            last_k = jnp.clip(
                (qi * block_q + block_q - 1 + seq_len_diff) // block_k,
                0, nk - 1,
            )
            return jnp.minimum(ki, last_k)

        def clamp_q(ki, qi):
            first_q = jnp.clip(
                (ki * block_k - seq_len_diff) // block_q, 0, nq - 1
            )
            return jnp.maximum(qi, first_q)
    else:
        clamp_k = lambda qi, ki: ki
        clamp_q = lambda ki, qi: qi

    # ---------------- dQ kernel: grid (b, h, nq, nk) ----------------
    dq_specs = [
        pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
        pl.BlockSpec((1, 1, block_k, d),
                     lambda bi, hi, qi, ki: (bi, kv_head(hi),
                                             clamp_k(qi, ki), 0)),
        pl.BlockSpec((1, 1, block_k, d),
                     lambda bi, hi, qi, ki: (bi, kv_head(hi),
                                             clamp_k(qi, ki), 0)),
        pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
        pl.BlockSpec((1, 1, block_q, 1), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
        pl.BlockSpec((1, 1, block_q, 1), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
    ]
    dq_args = [q, k, v, do, delta, inv_l]
    if has_mask:
        dq_args.append(mask_f)
        dq_specs.append(
            pl.BlockSpec((1, 1, block_k),
                         lambda bi, hi, qi, ki: (bi, 0, clamp_k(qi, ki)))
        )
    if has_bias:
        dq_args.append(bias)
        if bias_batch_dim:
            bidx = lambda bi, hi, qi, ki: (bi, qi, clamp_k(qi, ki))
        else:
            bidx = lambda bi, hi, qi, ki: (hi, qi, clamp_k(qi, ki))
        dq_specs.append(pl.BlockSpec((1, block_q, block_k), bidx))

    dq = pl.pallas_call(
        functools.partial(
            _dq_kernel, scale=float(scale), causal=causal, seq_q=seq_q,
            seq_k=seq_k, block_q=block_q, block_k=block_k, has_mask=has_mask,
            has_bias=has_bias, out_dtype=q.dtype, precision=precision,
        ),
        grid=(b, h, nq, nk),
        in_specs=dq_specs,
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(),
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*dq_args)

    # ------------- dKdV kernel: grid (b, nk, h, nq) -------------
    dkv_specs = [
        pl.BlockSpec((1, 1, block_q, d),
                     lambda bi, ki, hi, qi: (bi, hi, clamp_q(ki, qi), 0)),
        pl.BlockSpec((1, 1, block_k, d),
                     lambda bi, ki, hi, qi: (bi, kv_head(hi), ki, 0)),
        pl.BlockSpec((1, 1, block_k, d),
                     lambda bi, ki, hi, qi: (bi, kv_head(hi), ki, 0)),
        pl.BlockSpec((1, 1, block_q, d),
                     lambda bi, ki, hi, qi: (bi, hi, clamp_q(ki, qi), 0)),
        pl.BlockSpec((1, 1, 1, block_q),
                     lambda bi, ki, hi, qi: (bi, hi, 0, clamp_q(ki, qi))),
        pl.BlockSpec((1, 1, 1, block_q),
                     lambda bi, ki, hi, qi: (bi, hi, 0, clamp_q(ki, qi))),
    ]
    dkv_args = [q, k, v, do, delta_t, inv_l_t]
    if has_mask:
        # (b, 1, j, 1) so the block reads as a (block_k, 1) column vector
        dkv_args.append(mask_f[:, :, :, None])
        dkv_specs.append(
            pl.BlockSpec((1, 1, block_k, 1), lambda bi, ki, hi, qi: (bi, 0, ki, 0))
        )
    if has_bias:
        dkv_args.append(bias)
        if bias_batch_dim:
            bidx2 = lambda bi, ki, hi, qi: (bi, clamp_q(ki, qi), ki)
        else:
            bidx2 = lambda bi, ki, hi, qi: (hi, clamp_q(ki, qi), ki)
        dkv_specs.append(pl.BlockSpec((1, block_q, block_k), bidx2))

    kv_out_spec = pl.BlockSpec(
        (1, 1, block_k, d), lambda bi, ki, hi, qi: (bi, kv_head(hi), ki, 0)
    )
    dk, dv = pl.pallas_call(
        functools.partial(
            _dkdv_kernel, scale=float(scale), causal=causal, seq_q=seq_q,
            seq_k=seq_k, block_q=block_q, block_k=block_k, has_mask=has_mask,
            has_bias=has_bias, q_per_kv=q_per_kv,
            out_dtype=k.dtype, precision=precision,
        ),
        grid=(b, nk, h, nq),
        in_specs=dkv_specs,
        out_specs=[kv_out_spec, kv_out_spec],
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(),
            # nk is parallel (each K/V block's accumulation lives entirely
            # inside its own (h, q) sweep); h is parallel only when each
            # query head owns its KV head (no cross-head accumulation).
            # On single-core v5e this is documentation; on megacore parts
            # it enables splitting the grid across cores.
            dimension_semantics=(
                "parallel", "parallel",
                "parallel" if q_per_kv == 1 else "arbitrary",
                "arbitrary"),
        ),
        interpret=interpret,
    )(*dkv_args)

    db = None
    if has_bias:
        db = _bias_grad(
            q, k, v, do, delta, inv_l, mask_f, bias,
            bias_batch_dim=bias_batch_dim, scale=scale, causal=causal,
            block_q=block_q, block_k=block_k, nq=nq, nk=nk,
            interpret=interpret,
        )
    return dq, dk, dv, db


def _bias_grad(
    q, k, v, do, delta, inv_l, mask_f, bias, *,
    bias_batch_dim, scale, causal, block_q, block_k, nq, nk, interpret,
):
    """dB kernel: reduce dS over the axis the bias is broadcast over."""
    b, h, seq_q, d = q.shape
    kvh = k.shape[1]
    seq_k = k.shape[2]
    has_mask = mask_f is not None
    kv_head = ((lambda hi: hi) if kvh == h
               else (lambda hi: hi // (h // kvh)))
    precision = (jax.lax.Precision.HIGHEST
                 if q.dtype == jnp.float32 else jax.lax.Precision.DEFAULT)

    # grid = (bias_dim, nq, nk, reduce): reduce over heads for batch-dim
    # bias, over batch for head-dim bias
    if bias_batch_dim:
        nb, nr = b, h
        bh = lambda ni, ri: (ni, ri)     # (batch, head) from (bias idx, reduce)
    else:
        nb, nr = h, b
        bh = lambda ni, ri: (ri, ni)

    specs = [
        pl.BlockSpec((1, 1, block_q, d),
                     lambda ni, qi, ki, ri: (*bh(ni, ri), qi, 0)),
        pl.BlockSpec((1, 1, block_k, d),
                     lambda ni, qi, ki, ri: (bh(ni, ri)[0],
                                             kv_head(bh(ni, ri)[1]), ki, 0)),
        pl.BlockSpec((1, 1, block_k, d),
                     lambda ni, qi, ki, ri: (bh(ni, ri)[0],
                                             kv_head(bh(ni, ri)[1]), ki, 0)),
        pl.BlockSpec((1, 1, block_q, d),
                     lambda ni, qi, ki, ri: (*bh(ni, ri), qi, 0)),
        pl.BlockSpec((1, 1, block_q, 1),
                     lambda ni, qi, ki, ri: (*bh(ni, ri), qi, 0)),
        pl.BlockSpec((1, 1, block_q, 1),
                     lambda ni, qi, ki, ri: (*bh(ni, ri), qi, 0)),
    ]
    args = [q, k, v, do, delta, inv_l]
    if has_mask:
        args.append(mask_f)
        specs.append(
            pl.BlockSpec((1, 1, block_k),
                         lambda ni, qi, ki, ri: (bh(ni, ri)[0], 0, ki))
        )
    args.append(bias)
    specs.append(
        pl.BlockSpec((1, block_q, block_k), lambda ni, qi, ki, ri: (ni, qi, ki))
    )

    db = pl.pallas_call(
        functools.partial(
            _db_kernel, scale=float(scale), causal=causal, seq_q=seq_q,
            seq_k=seq_k, block_q=block_q, block_k=block_k, has_mask=has_mask,
            out_dtype=bias.dtype, precision=precision,
        ),
        grid=(nb, nq, nk, nr),
        in_specs=specs,
        out_specs=pl.BlockSpec(
            (1, block_q, block_k), lambda ni, qi, ki, ri: (ni, qi, ki)
        ),
        out_shape=jax.ShapeDtypeStruct(bias.shape, bias.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, block_k), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(),
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)
    return db
