"""Pallas TPU forward kernel for cosine-sim flash attention.

TPU-native redesign of the reference CUDA forward kernel
(reference: flash_cosine_sim_attention_cuda.cu:1072-1247).  The algorithm is
the same — because Q/K are l2-normalized and multiplied by a fixed scale,
logits are bounded by ``scale``, so each tile exponentiates
``exp(scale*sim - scale + bias)`` directly with NO running row-max
(cu:1204-1217), accumulates un-normalized O and the row-sum L, and divides
by L once at the end (cu:1239-1246).

The mapping to TPU is very different from the CUDA realization:

  * grid = (batch, heads, q_blocks, k_blocks) with the K axis innermost and
    marked "arbitrary" (sequential); batch/head/q axes are "parallel".
    This replaces the CUDA block grid (cu:1714-1718).
  * the Q block's index map ignores the K axis, so Mosaic keeps the Q tile
    resident in VMEM across the whole K loop — the TPU equivalent of the
    reference's shared-memory Q fragment caching (cu:110-159).
  * the f32 O accumulator and rowsum live in VMEM scratch, which persists
    across sequential grid steps; warp tiles / WMMA fragments (cu:604-1067)
    collapse into plain ``jnp.dot`` on VMEM blocks lowered onto the MXU.
  * causal tiles strictly above the diagonal are skipped with ``pl.when``
    (the analogue of the early-exit at cu:1178), and partially-masked tiles
    fuse bounds + causal + key-mask + bias into the exp in one vectorized
    ``jnp.where`` (cu:1204-1217).
  * non-multiple sequence lengths are handled by masked edges (bounds
    tests against iota), not padding copies.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .blocks import EPS, pick_fwd_blocks_t
from .blocks import vmem_limit as _vmem_limit
from .mxu import make_mm as _make_mm

LOG2E = 1.4426950408889634


def _fwd_kernel_t(
    *refs,
    scale: float,
    causal: bool,
    seq_q: int,
    seq_k: int,
    block_q: int,
    bko: int,
    bki: int,
    has_mask: bool,
    has_bias: bool,
    out_dtype,
    s_dequant: float,
):
    """Transposed forward: s^T = K Q^T, O^T = V^T e^T.

    Both matmuls then have their OUTPUT width on the big lane dimension
    (block_q), so only QK's unavoidable d-deep contraction under-fills the
    128x128 MXU; PV runs at full utilization (the row-major kernel paid
    the d-wide-lanes penalty on BOTH — measured 1.4x slower at d=64).
    One grid step consumes a large outer K block (``bko``) via an unrolled
    inner loop of (bki, block_q) sub-tiles: big blocks amortize per-step
    overhead, the small inner tile keeps causal skipping fine-grained and
    bounds the live f32 score tile.  The exp-weight convention drops the
    reference's ``- scale`` shift (cu:1216) entirely: a CONSTANT factor on
    every exp-weight cancels in O = acc / rowsum, which only the
    no-row-max property makes possible — one less VPU op per element, and
    the ``scale * log2e`` multiply is pre-folded into the Q tile (d-wide
    work instead of seq_k-wide).
    """
    idx = 0
    qT_ref = refs[idx]; idx += 1          # (1, 1, d, block_q)
    k_ref = refs[idx]; idx += 1           # (1, 1, bko, d)
    vT_ref = refs[idx]; idx += 1          # (1, 1, d, bko)
    mask_ref = None
    biasT_ref = None
    if has_mask:
        mask_ref = refs[idx]; idx += 1    # (1, bko, 1) f32
    if has_bias:
        biasT_ref = refs[idx]; idx += 1   # (1, bko, block_q) j-major
    oT_ref, lT_ref, acc_ref, lsum_ref = refs[idx : idx + 4]

    qi = pl.program_id(2)
    ki = pl.program_id(3)
    nk = pl.num_programs(3)
    seq_len_diff = seq_k - seq_q

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        lsum_ref[...] = jnp.zeros_like(lsum_ref)

    q_last = qi * block_q + block_q - 1 + seq_len_diff
    run = (q_last >= ki * bko) if causal else True

    @pl.when(run)
    def _tile():
        c = scale * LOG2E
        qT = qT_ref[0, 0]
        if qT.dtype != jnp.int8:
            # pre-fold scale*log2e into the (d, block_q) Q tile: the MXU
            # then emits ready-to-exp2 logits
            qT = (qT.astype(jnp.float32) * c).astype(qT_ref.dtype)

        # lane-narrowing case count: a causal sub-tile starting t columns
        # past the q block's first position only touches q lanes >= t, so
        # its matmuls can statically shrink to the lane window [t, block_q)
        # — the diagonal over-compute that made big lane blocks causal-
        # hostile disappears.  One pl.when case per bki-granule of t;
        # ncase == 1 (e.g. the default block_q == bki) emits exactly the
        # single-branch kernel.
        ncase = (block_q // bki
                 if causal and block_q > bki and block_q % bki == 0 else 1)

        n_sub = bko // bki
        for j in range(n_sub):
            col0 = ki * bko + j * bki  # traced (ki is a program id)
            # static reachability of the sequence edge for THIS j: only
            # the last outer block can overrun, at ki = nk - 1
            edge_possible = (nk - 1) * bko + (j + 1) * bki > seq_k

            def _sub(off, j=j, col0=col0, edge_possible=edge_possible):
                w = block_q - off                 # static lane window
                kj = k_ref[0, 0, j * bki:(j + 1) * bki]       # (bki, d)
                if off and qT.dtype != jnp.int8:
                    # windowed Q is re-loaded from the ref (and re-scaled)
                    # rather than lane-sliced from the full-width register:
                    # register values with a lane offset trip a Mosaic
                    # "Invalid input layout" (see bwd_kernel._dq_kernel_t)
                    qT_w = (qT_ref[0, 0, :, off:].astype(jnp.float32)
                            * c).astype(qT_ref.dtype)
                else:
                    qT_w = qT if not off else None
                if has_bias:
                    # bias arrives j-major (bias^T): same (k-rows,
                    # q-lanes) orientation as s^T, so it adds straight
                    # into the logits with no in-kernel relayout
                    biasT_j = biasT_ref[
                        0, j * bki:(j + 1) * bki, off:].astype(jnp.float32)
                if kj.dtype == jnp.int8:
                    sT = jax.lax.dot_general(
                        kj, qT_ref[0, 0, :, off:], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    ).astype(jnp.float32)
                    logits2 = sT * (c * s_dequant)
                    if has_bias:
                        logits2 = logits2 + biasT_j * LOG2E
                    e = jnp.exp2(logits2)
                else:
                    # f32 inputs: 3-pass bf16 hi/lo split (see ops/mxu.py)
                    # instead of HIGHEST's 6-pass lowering — same trick as
                    # the backward, halves the f32 MXU work
                    sT = _make_mm(kj.dtype)(
                        kj, qT_w, (((1,), (0,)), ((), ())),
                    )                                          # (bki, w)
                    if has_bias:
                        sT = sT + biasT_j * LOG2E
                    e = jnp.exp2(sT)

                # k positions ride the SUBLANES.  Predicates on the traced
                # col0 fold into ONE fused where; statically-unreachable
                # terms are dropped at trace time.
                keep = None
                col_s = None
                if edge_possible or causal:
                    col_s = col0 + jax.lax.broadcasted_iota(
                        jnp.int32, (bki, w), 0)
                if edge_possible:
                    keep = col_s < seq_k
                if causal:
                    # q positions ride the LANES (pre-shifted by the
                    # cross-attention causal alignment, cu:1097: query row
                    # r sees cols <= r + diff)
                    row = (qi * block_q + off + seq_len_diff
                           + jax.lax.broadcasted_iota(jnp.int32, (bki, w), 1))
                    # whole sub-tile below the diagonal -> mask is a no-op
                    sub_interior = col0 + bki - 1 <= (
                        qi * block_q + seq_len_diff)
                    cc = jnp.logical_or(sub_interior, col_s <= row)
                    keep = cc if keep is None else keep & cc
                if has_mask:
                    km = mask_ref[0, j * bki:(j + 1) * bki] > 0  # (bki, 1)
                    keep = km if keep is None else keep & km
                if keep is not None:
                    e = jnp.where(keep, e, 0.0)

                vj = vT_ref[0, 0, :, j * bki:(j + 1) * bki]    # (d, bki)
                if edge_possible and seq_k % bki != 0:
                    # zero V's OOB lanes: the zeroed e rows hit them in the
                    # contraction and 0 * garbage = NaN otherwise
                    lane = col0 + jax.lax.broadcasted_iota(
                        jnp.int32, (1, bki), 1)
                    vj = jnp.where(lane < seq_k, vj, jnp.zeros_like(vj))

                eb = e.astype(vT_ref.dtype)
                lsum_ref[:, off:] += jnp.sum(e, axis=0, keepdims=True)
                acc_ref[:, off:] += _make_mm(vj.dtype)(
                    vj, eb, (((1,), (0,)), ((), ())),
                )                                              # (d, w)

            if causal:
                if ncase == 1:
                    # sub-tile-granular causal skip: tiles fully above the
                    # diagonal cost no MXU/VPU work (cu:1178's early exit)
                    pl.when(q_last >= col0)(lambda: _sub(0))
                else:
                    t = col0 - (qi * block_q + seq_len_diff)
                    # t < bki: interior + first-diagonal granule (t <= 0
                    # included); t >= block_q: above the diagonal, no
                    # branch fires (the causal skip).  Each case's lane
                    # window [c*bki, block_q) covers every valid lane
                    # (valid q >= col0 -> lane index >= t >= c*bki).
                    pl.when(t < bki)(lambda: _sub(0))
                    for cs in range(1, ncase):
                        pl.when((t >= cs * bki) & (t < (cs + 1) * bki))(
                            functools.partial(_sub, cs * bki))
            else:
                _sub(0)

    @pl.when(ki == nk - 1)
    def _finalize():
        inv_l = 1.0 / jnp.maximum(lsum_ref[...], EPS)          # (1, block_q)
        oT_ref[0, 0] = (acc_ref[...] * inv_l).astype(out_dtype)
        lT_ref[0, 0] = inv_l


def _forward_transposed(
    q, k, v, mask, biasT=None, *, scale, causal, block_q, block_k,
    interpret, s_dequant, bias_batch_dim=False,
):
    """Launch the transposed kernel; returns (o, inv_l (b,h,i,1)).

    ``biasT`` is the j-major transpose of the attention bias,
    (b|h, seq_k, seq_q): the one-time XLA relayout at the API is amortized
    across the forward and both backward kernels (inside one jit the
    backward's identical transpose CSEs with this one), and every kernel
    then streams bias tiles already in its (k-rows, q-lanes) orientation.
    """
    b, h, seq_q, d = q.shape
    kvh = k.shape[1]
    seq_k = k.shape[2]
    q_per_kv = h // kvh

    bq_d, bko_d, bki_d = pick_fwd_blocks_t(q.dtype, d, seq_q, seq_k)
    # public block overrides keep their row-major meaning: block_q is the
    # Q tile, block_k bounds BOTH K windows
    bq = block_q or bq_d
    bko = block_k or bko_d
    bki = min(block_k or bki_d, bko)
    if bko % bki:
        # the inner loop covers exactly bko // bki sub-tiles; a remainder
        # would DROP K columns
        bki = bko
    nq = pl.cdiv(seq_q, bq)
    nk = pl.cdiv(seq_k, bko)

    qT = q.swapaxes(-1, -2)   # (b, h, d, i) — XLA folds these relayouts
    vT = v.swapaxes(-1, -2)   # (b, kvh, d, j)

    kv_head = (lambda hi: hi) if kvh == h else (lambda hi: hi // q_per_kv)

    seq_len_diff = seq_k - seq_q
    if causal:
        def clamp_k(qi, ki):
            last_k = jnp.clip(
                (qi * bq + bq - 1 + seq_len_diff) // bko, 0, nk - 1)
            return jnp.minimum(ki, last_k)
    else:
        clamp_k = lambda qi, ki: ki

    in_specs = [
        pl.BlockSpec((1, 1, d, bq), lambda bi, hi, qi, ki: (bi, hi, 0, qi)),
        pl.BlockSpec((1, 1, bko, d),
                     lambda bi, hi, qi, ki: (bi, kv_head(hi),
                                             clamp_k(qi, ki), 0)),
        pl.BlockSpec((1, 1, d, bko),
                     lambda bi, hi, qi, ki: (bi, kv_head(hi), 0,
                                             clamp_k(qi, ki))),
    ]
    args = [qT, k, vT]
    has_mask = mask is not None
    has_bias = biasT is not None
    if has_mask:
        # (b, j, 1) f32: key-mask values ride the sublanes
        args.append(mask.astype(jnp.float32)[:, :, None])
        in_specs.append(
            pl.BlockSpec((1, bko, 1),
                         lambda bi, hi, qi, ki: (bi, clamp_k(qi, ki), 0)))
    if has_bias:
        args.append(biasT)
        if bias_batch_dim:
            biasT_idx = lambda bi, hi, qi, ki: (bi, clamp_k(qi, ki), qi)
        else:
            biasT_idx = lambda bi, hi, qi, ki: (hi, clamp_k(qi, ki), qi)
        in_specs.append(pl.BlockSpec((1, bko, bq), biasT_idx))

    out_dtype = v.dtype if q.dtype == jnp.int8 else q.dtype
    kernel = functools.partial(
        _fwd_kernel_t,
        scale=float(scale), causal=causal, seq_q=seq_q, seq_k=seq_k,
        block_q=bq, bko=bko, bki=bki, has_mask=has_mask, has_bias=has_bias,
        out_dtype=out_dtype,
        s_dequant=float(s_dequant),
    )

    oT, lT = pl.pallas_call(
        kernel,
        grid=(b, h, nq, nk),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, d, bq), lambda bi, hi, qi, ki: (bi, hi, 0, qi)),
            pl.BlockSpec((1, 1, 1, bq), lambda bi, hi, qi, ki: (bi, hi, 0, qi)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, d, seq_q), out_dtype),
            jax.ShapeDtypeStruct((b, h, 1, seq_q), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((d, bq), jnp.float32),
            pltpu.VMEM((1, bq), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(),
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(*args)
    return oT.swapaxes(-1, -2), lT.swapaxes(-1, -2)


def flash_attention_forward(
    q: jax.Array,                 # (b, h, i, d)
    k: jax.Array,                 # (b, kvh, j, d), kvh in {h, 1}
    v: jax.Array,                 # (b, kvh, j, d)
    mask: Optional[jax.Array],    # (b, j) bool or None
    bias: Optional[jax.Array],    # (b|h, i, j) or None
    *,
    bias_batch_dim: bool,
    scale: float,
    causal: bool,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: bool = False,
    s_dequant: float = 1.0,
):
    """Launch the fused forward; returns (o, inv_rowsum).

    q/k must already be l2-normalized (normalization, like the reference,
    happens in the Python wrapper — ref .py:320-321).  For the int8-QK
    path, q/k arrive already quantized (int8) and ``s_dequant`` carries
    the 1/127^2 score dequant factor; ``v`` stays high-precision.
    """
    b, h, seq_q, d = q.shape
    kvh = k.shape[1]
    seq_k = k.shape[2]
    assert v.shape == k.shape
    assert h % kvh == 0, (h, kvh)  # 1 (MQA) ... h (MHA), anything between (GQA)
    q_per_kv = h // kvh

    # the transposed kernel (full-rate PV on the MXU) is the only path:
    # a (b|h, i, j) bias rides along as its one-time j-major relayout
    # (see _forward_transposed), measured cheaper than forfeiting the
    # transposed kernels' MXU orientation win
    biasT = bias.swapaxes(-1, -2) if bias is not None else None
    return _forward_transposed(
        q, k, v, mask, biasT, scale=scale, causal=causal, block_q=block_q,
        block_k=block_k, interpret=interpret, s_dequant=s_dequant,
        bias_batch_dim=bias_batch_dim,
    )
