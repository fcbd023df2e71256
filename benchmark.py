"""Benchmark CLI: fused Pallas kernel vs XLA-naive cosine-sim attention.

TPU rebuild of the reference driver (reference: benchmark.py:1-138): same
flags (--causal, --mask-prob, --only-forwards, --only-backwards,
--num-times), same seq-len sweep 128..8192 at batch 4 / heads 8 /
dim_head 64, fused kernel vs the unfused einsum baseline, OOM reported
instead of crashing.  Dtypes are f32 and bf16 (the TPU's half precision).

Beyond the reference: an MFU column for the fused kernel — algorithmic
FLOPs (fwd 4*b*h*i*j*d, x2.5 for bwd, x3.5 for fwd+bwd, halved when
causal; recompute NOT counted) over the chip's bf16 peak.

Usage:  python benchmark.py [--causal] [--mask-prob 0.25]
                            [--only-forwards | --only-backwards]
                            [--num-times 20] [--seq-lens 1024 4096]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from flash_cosine_sim_attention_tpu import flash_cosine_sim_attention
from flash_cosine_sim_attention_tpu.utils import benchmark
from flash_cosine_sim_attention_tpu.utils.benchmark import (
    xla_naive_cosine_sim_attention,
)

BATCH = 4
HEADS = 8
DIM_HEAD = 64

# bf16 MXU peak FLOP/s by device kind substring (MFU denominators; f32
# rows are also rated against the bf16 peak — the honest silicon ceiling)
PEAK_FLOPS = (
    ("v6", 918e12),
    ("v5p", 459e12),
    ("v5", 197e12),   # v5e / "TPU v5 lite"
    ("v4", 275e12),
)


def device_peak_flops() -> float:
    kind = jax.devices()[0].device_kind.lower()
    for key, peak in PEAK_FLOPS:
        if key in kind:
            return peak
    return 197e12  # unknown chip: rate against v5e


def device_free_bytes():
    """Free HBM from a live device query (None if unsupported)."""
    try:
        stats = jax.devices()[0].memory_stats()
        return stats["bytes_limit"] - stats.get("bytes_in_use", 0)
    except Exception:
        return None


def attention_flops(seq: int, mode: str, causal: bool) -> float:
    """Algorithmic FLOPs (recompute not counted, mirroring MFU convention):
    fwd = QK^T + PV = 4*b*h*s^2*d; bwd = 2.5x fwd (dV, dP, dS.K, dS^T.Q
    + the one S recompute the algorithm needs); causal halves the score
    area."""
    base = 4.0 * BATCH * HEADS * seq * seq * DIM_HEAD
    mult = {"fwd": 1.0, "bwd": 2.5, "fwd+bwd": 3.5}[mode]
    return base * mult * (0.5 if causal else 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--causal", action="store_true")
    ap.add_argument("--mask-prob", type=float, default=0.0)
    ap.add_argument("--only-forwards", action="store_true")
    ap.add_argument("--only-backwards", action="store_true")
    ap.add_argument("--num-times", type=int, default=20)
    ap.add_argument("--seq-lens", type=int, nargs="*",
                    default=[128, 256, 512, 1024, 2048, 4096, 8192])
    args = ap.parse_args()
    assert not (args.only_forwards and args.only_backwards)

    forwards = not args.only_backwards
    backwards = not args.only_forwards
    mode = ("fwd" if not backwards else
            "bwd" if not forwards else "fwd+bwd")

    rng = np.random.default_rng(0)
    peak = device_peak_flops()
    print(f"device: {jax.devices()[0].device_kind}   mode: {mode}   "
          f"causal: {args.causal}   mask: {args.mask_prob}")
    print(f"{'dtype':>9} {'seq':>6} {'fused ms':>10} {'MFU':>6} "
          f"{'naive ms':>10} {'fused/naive':>12}")

    for dtype in (jnp.float32, jnp.bfloat16):
        for seq in args.seq_lens:
            q, k, v = (jnp.asarray(
                rng.standard_normal((BATCH, HEADS, seq, DIM_HEAD)), dtype)
                for _ in range(3))
            mask = (jnp.asarray(rng.random((BATCH, seq)) > args.mask_prob)
                    if args.mask_prob > 0 else None)

            def fused(q, k, v):
                return flash_cosine_sim_attention(
                    q, k, v, mask=mask, causal=args.causal)

            def naive(q, k, v):
                return xla_naive_cosine_sim_attention(
                    q, k, v, mask=mask, causal=args.causal)

            t_fused = benchmark(fused, q, k, v, forwards=forwards,
                                backwards=backwards,
                                num_times=args.num_times)
            mfu = attention_flops(seq, mode, args.causal) / (
                t_fused * 1e-3) / peak

            # Gate the unfused baseline on a LIVE device-memory query:
            # the (b, h, s, s) f32 logits + softmax (+ cotangents under
            # grad) must fit in free HBM.  Actually provoking the OOM
            # kills the tunneled TPU worker process (unlike CUDA's
            # recoverable allocator, ref benchmark.py:129-136), so on
            # backends without memory_stats a real try/except still
            # guards the run.
            n_bufs = 4 if backwards else 2
            est = BATCH * HEADS * seq * seq * 4 * n_bufs
            free = device_free_bytes()
            fits = est < (free * 0.9 if free is not None else 13e9)
            if not fits:
                naive_s, ratio = "       oom", "          —"
            else:
                try:
                    t_naive = benchmark(naive, q, k, v, forwards=forwards,
                                        backwards=backwards,
                                        num_times=args.num_times)
                    ratio = f"{t_fused / t_naive:11.2f}x"
                    naive_s = f"{t_naive:10.2f}"
                except Exception:  # baseline OOM (recoverable backends)
                    naive_s, ratio = "       oom", "          —"
            print(f"{jnp.dtype(dtype).name:>9} {seq:>6} {t_fused:10.2f} "
                  f"{mfu:5.1%} {naive_s} {ratio}", flush=True)


if __name__ == "__main__":
    main()
