"""Block-size dispatch tables for the Pallas kernels.

The TPU analogue of the reference's compile-time layout tables
(reference: flash_cosine_sim_attention_cuda.cu:320-597, which picks
threads-per-block / tile sizes per dtype and head-dim).  On TPU the MXU is a
128x128 systolic array and VMEM is ~16 MB/core, so tiles are much larger
than the reference's 64x64: the table below is keyed by (dtype kind,
head_dim) and was tuned on TPU v5e.
"""

from __future__ import annotations

import jax.numpy as jnp

# head dims the reference supports (cu:84: {16, 32, 64, 96, 128}); we accept
# any multiple of 8 but tune for these.
ALLOWED_DIM_HEADS = (16, 32, 64, 96, 128)

EPS = 1e-10  # rowsum clamp, matches reference kernel eps (cu:83)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def vmem_limit() -> int:
    """Scoped-VMEM cap (bytes) for the fused kernels' CompilerParams.

    XLA's default scoped-vmem limit is 16 MiB, which rejected several of
    the round-3 swept block configs at compile time (e.g. the fwd
    (1024, 4096, 512) arm needed 19.6 MiB of kernel stack); v5e has
    128 MiB of physical VMEM per core, so a higher cap is safe — it is
    an admission limit the compiler checks, not an allocation.
    ``FCSA_VMEM_MB`` overrides for sweeps.
    """
    import os

    mb = os.environ.get("FCSA_VMEM_MB")
    return int(float(mb) * 2**20) if mb else 64 * 2**20


def pick_block_sizes(dtype, head_dim: int, seq_q: int, seq_k: int,
                     kind: str = "fwd"):
    """Return (block_q, block_k) for the fused kernels.

    Larger K blocks amortize the per-grid-step overhead; Q blocks are kept
    moderate so the f32 (block_q, block_k) exp-weight tile and the
    (block_q, head_dim) accumulator fit VMEM comfortably alongside
    double-buffered K/V blocks.  ``kind`` ("fwd"/"bwd") selects the table;
    FCSA_{FWD,BWD}_BQ/BK env vars override for sweeping.
    """
    import os

    pfx = "FCSA_BWD_" if kind == "bwd" else "FCSA_FWD_"
    env_bq = os.environ.get(pfx + "BQ")
    env_bk = os.environ.get(pfx + "BK")
    if env_bq and env_bk:
        return int(env_bq), int(env_bk)
    # v5e-swept (tools/tune_blocks.py, seq 4096 causal): tall Q blocks win —
    # the Q/dO/O tiles and the dQ accumulator are fetched/flushed once per
    # row block, so fewer row blocks means proportionally less non-K/V
    # traffic and per-grid-step overhead; (1024, 512) beat the old
    # (256, 1024) by ~22% on fwd+bwd.
    if dtype == jnp.float32:
        # f32 tiles are 4-byte: (512, 512) fits VMEM for both directions
        # ((1024, 1024) OOMs the backward's transposed tile)
        block_q, block_k = 512, 512
    elif kind == "bwd":
        # bwd swept best at (1024, 1024) bf16 (the dKdV pass reuses its
        # K/V-side tiles over a bigger Q sweep)
        block_q, block_k = 1024, 1024
    else:  # bf16 / f16 forward
        # d<=64: (1024, 512); d=128 swept best at (1024, 1024) — the
        # deeper contraction amortizes more K/V traffic per tile
        block_q, block_k = 1024, (1024 if head_dim > 64 else 512)

    # clamp to the (128-aligned) sequence lengths so tiny inputs get a
    # single masked block instead of a mostly-empty large one
    block_q = min(block_q, _round_up(max(seq_q, 1), 128))
    block_k = min(block_k, _round_up(max(seq_k, 1), 128))
    return block_q, block_k


def pick_bwd_blocks_t(dtype, head_dim: int, seq_q: int, seq_k: int,
                      has_bias: bool = False, which: str = "dq"):
    """(block_own, block_other_outer, block_other_inner) for the
    TRANSPOSED backward kernels.

    The dQ kernel owns a q block (lanes) and streams K/V in big outer
    blocks; the dKdV kernel owns a k block (lanes) and streams Q/dO.
    Sub-tiling bounds the live f32 score tiles (two per step: s^T and
    dP^T).  ``which`` ("dq"/"dkdv") selects the kernel's table entry —
    the two kernels stream different operand sets, so their optima need
    not coincide.  FCSA_DQ_*/FCSA_DKDV_* env triples override per
    kernel; FCSA_BWD_BQ/BKO/BKI overrides both.
    """
    import os

    pfx = "FCSA_DQ_" if which == "dq" else "FCSA_DKDV_"
    env = [os.environ.get(pfx + k) or os.environ.get("FCSA_BWD_" + k)
           for k in ("BQ", "BKO", "BKI")]
    if all(env):
        bo, bko, bki = (int(x) for x in env)
    elif has_bias and dtype != jnp.float32:
        # v5e r5 sweep (biased causal bf16 @4096 fwd+bwd): (1024, 2048,
        # 512) -> 4.02 ms vs 4.42 at the old conservative (512, 1024,
        # 512) — the dB^T VMEM scratch fits comfortably at 8 MB
        bo, bko, bki = 1024, 2048, 512
    elif has_bias:
        # f32 bias: the dB scratch and bias^T windows are 4-byte — keep
        # the conservative triple (unswept; VMEM-bound)
        bo, bko, bki = 512, 1024, 512
    elif dtype == jnp.float32:
        bo, bko, bki = 512, 1024, 512
    elif which == "dq":
        # v5e round-4 interleaved A/B (causal bf16 d=64 @4096, dQ pass
        # isolated via DCE, round-robin medians): (1024, 4096, 512)
        # -> 1.213 ms (lane-narrowed diagonal, ncase=2) vs 1.235
        # @bki 1024, 1.367 @the r3 (512, 2048, 1024), 3.74 @bki 256
        # (branch-case explosion)
        bo, bko, bki = 1024, 4096, 512
    else:
        # v5e round-3 sweep (causal bf16 d=64 @4096, dKdV = all - pinned
        # dQ): (1024, 4096, 1024) -> 1.503 ms vs 1.527 @bko 2048, 1.562
        # @bo 512, 1.570 @the old (512, 4096, 512) default
        bo, bko, bki = 1024, 4096, 1024
    bo = min(bo, _round_up(max(seq_q, 1), 128))
    bki = min(bki, _round_up(max(seq_k, 1), 128))
    # bko MUST be a multiple of bki (the unrolled inner loop covers
    # exactly bko // bki sub-tiles; a remainder would silently DROP the
    # trailing K columns) — clamp to the bki-aligned sequence cover
    bko = min(bko, _round_up(max(seq_k, 1), bki))
    assert bko % bki == 0, (bko, bki)
    return bo, bko, bki


def pick_fused_bwd_blocks(dtype, head_dim: int, seq_q: int, seq_k: int,
                          causal: bool = False):
    """(block_k, block_q_inner) for the ONE-pass fused backward kernel.

    The kernel owns a k block (``block_k`` rows of s^T / lanes of the
    dk/dv accumulators) and walks the VMEM-resident q extent in
    ``block_q_inner``-lane sub-tiles.  The round-5 v5e sweeps found the
    CAUSAL path collapses at block shapes that are fine non-causally
    (the predicated straddle/interior branches stop overlapping with
    the K/V stream past a per-dtype k block size): causal bf16 @8192
    ran 12.6 ms at (1024, 1024) vs 6.8 at (512, 1024), causal f32
    @4096 10.3 ms at (512, 512) vs 4.7 at (256, 256) — and the causal
    winners cost little at the non-causal shapes, so the table below
    needs only dtype + seq keys (``causal`` is accepted for future
    per-path splits; causal f32 past 4096 instead drops to the
    two-pass kernels — see flash_attention_backward).  FCSA_FB_BK /
    FCSA_FB_BQI override for sweeps.
    """
    import os

    env_bk = os.environ.get("FCSA_FB_BK")
    env_bqi = os.environ.get("FCSA_FB_BQI")
    if env_bk and env_bqi:
        bk, bqi = int(env_bk), int(env_bqi)
    elif dtype == jnp.float32:
        # f32 score tiles are 4-byte twice over (s^T and dP^T live
        # together): quarter both axes — the 3-pass f32 matmuls keep the
        # MXU busy enough that small tiles cost nothing non-causally
        # (v5e r5 @4096: (256,256) 7.63 ms vs (512,512) 7.99) and causal
        # collapses at anything bigger ((256,256) 4.72 vs (512,512) 10.32)
        bk, bqi = 256, 256
    elif seq_q > 4096:
        # v5e r5 sweep (bf16 d=64 @8192): causal (512, 1024) 6.79 ms vs
        # 12.6 at (1024, 1024); non-causal the two tie (9.96 vs 10.0),
        # so the seq key alone decides.  At seq <= 4096 (1024, 1024)
        # still wins causal (1.81 vs 1.87 @4096)
        bk, bqi = 512, 1024
    else:
        # v5e round-4 sweep (causal bf16 d=64 @4096): see bwd_kernel
        bk, bqi = 1024, 1024
    bk = min(bk, _round_up(max(seq_k, 1), 128))
    bqi = min(bqi, _round_up(max(seq_q, 1), 128))
    return bk, bqi


def onepass_bwd_max_seq() -> int:
    """Residency cap for the one-pass fused backward: its dQ^T accumulator
    and Q/dO tiles keep the WHOLE q extent in VMEM, so it gates on seq_q
    and longer sequences take the two-pass kernels.  Default 8192 (~6 MiB
    resident at d=64 bf16); FCSA_ONEPASS_MAX_SEQ overrides (0 disables
    the one-pass path)."""
    import os

    return int(os.environ.get("FCSA_ONEPASS_MAX_SEQ", "8192"))


def pick_fwd_blocks_t(dtype, head_dim: int, seq_q: int, seq_k: int):
    """(block_q, block_k_outer, block_k_inner) for the TRANSPOSED forward.

    The transposed kernel streams Q positions on lanes, so ``block_q`` is
    a lane count; K is consumed in big outer blocks (one DMA, one grid
    step) walked by an unrolled inner sub-tile loop that bounds the live
    f32 score tile to (block_k_inner, block_q) — big outer blocks
    amortize per-grid-step overhead (the r2 sweep's (512, 4096, 512) ran
    0.88 ms causal bf16 d=64 @4096 vs 1.23 for the row-major kernel; the
    r4/r5 rows below improve on it per dtype/head_dim, and seqs past
    4096 stream the WHOLE K extent as one outer block).
    FCSA_FWD_BQ/BKO/BKI override.
    """
    import os

    env = [os.environ.get("FCSA_FWD_" + k) for k in ("BQ", "BKO", "BKI")]
    if all(env):
        bq, bko, bki = (int(x) for x in env)
    elif dtype == jnp.float32:
        # v5e r5 sweep: (1024, 4096, 512) wins both causal (2.38 ms vs
        # 2.50 at the old (512, 2048, 512)) and plain (3.77 vs 3.93)
        # @4096 — with the 3-pass f32 matmuls the bigger streamed block
        # amortizes like bf16's, and bki 512 keeps the f32 score tile
        # (and causal narrowing granule) at half the bf16 footprint
        bq, bko, bki = 1024, 4096, 512
    elif head_dim <= 32:
        # v5e r5 head-dim sweep (causal @4096): the shallower contraction
        # favors a finer causal lane-narrowing granule — d16 0.80 ms vs
        # 0.90 at bki 1024, d32 0.845 vs 0.913; non-causal is neutral
        # (d16: 0.973 vs 0.978), so head_dim alone keys the row
        bq, bko, bki = 1024, 4096, 512
    elif 64 < head_dim <= 96:
        # v5e r5: d96 causal 0.776 ms at bki 256 vs 1.024 at 1024
        # (ncase=4 narrowing pays for itself at the 6-sublane-tile d);
        # non-causal neutral (1.395 vs 1.389)
        bq, bko, bki = 1024, 4096, 256
    else:
        # v5e round-3/4 sweep (causal bf16 d=64 @4096): (1024, 4096,
        # 1024) -> 0.870 ms vs 0.977 @the old (512, 4096, 512) — fewer
        # lane blocks mean fewer Q/O fetch+flush rounds, and the 1024
        # inner sub-tile's extra diagonal waste is cheaper than the
        # per-sub-tile overhead it removes
        bq, bko, bki = 1024, 4096, 1024
    if dtype != jnp.float32 and seq_k > 4096:
        # r5 @8192: streaming the whole K extent in ONE outer block wins
        # causal (3.06 ms vs 3.22 at bko 4096) and plain (4.52 vs 4.62);
        # bko clamps to the seq cover below, so seqs <= 4096 are
        # untouched and 16k+ caps at an 8192 window (4 MB double-
        # buffered K/V^T at d=64).  f32 keeps 4096 (4-byte windows)
        bko = 8192
    bq = min(bq, _round_up(max(seq_q, 1), 128))
    bki = min(bki, _round_up(max(seq_k, 1), 128))
    # bko MUST be a multiple of bki (see pick_bwd_blocks_t)
    bko = min(bko, _round_up(max(seq_k, 1), bki))
    assert bko % bki == 0, (bko, bki)
    return bq, bko, bki
