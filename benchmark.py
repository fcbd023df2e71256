"""Benchmark CLI: fused Pallas kernel vs XLA-naive cosine-sim attention.

TPU rebuild of the reference driver (reference: benchmark.py:1-138): same
flags (--causal, --mask-prob, --only-forwards, --only-backwards,
--num-times), same seq-len sweep 128..8192 at batch 4 / heads 8 /
dim_head 64, fused kernel vs the unfused einsum baseline, OOM reported
instead of crashing.  Dtypes are f32 and bf16 (the TPU's half precision).

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
    print(f"device: {jax.devices()[0].device_kind}   mode: {mode}   "
          f"causal: {args.causal}   mask: {args.mask_prob}")
    print(f"{'dtype':>9} {'seq':>6} {'fused ms':>10} {'naive ms':>10} "
          f"{'fused/naive':>12}")

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
            # Predict baseline OOM instead of provoking it: the unfused
            # path materializes the (b, h, s, s) f32 logits plus softmax
            # output and their cotangents; actually OOMing the tunneled
            # TPU worker kills the whole process (unlike CUDA's
            # recoverable allocator, ref benchmark.py:129-136).
            n_bufs = 4 if backwards else 2
            est = BATCH * HEADS * seq * seq * 4 * n_bufs
            if est > 13e9:
                naive_s, ratio = "       oom", "          —"
            else:
                try:
                    t_naive = benchmark(naive, q, k, v, forwards=forwards,
                                        backwards=backwards,
                                        num_times=args.num_times)
                    ratio = f"{t_fused / t_naive:11.2f}x"
                    naive_s = f"{t_naive:10.2f}"
                except Exception:  # baseline OOM
                    naive_s, ratio = "       oom", "          —"
            print(f"{jnp.dtype(dtype).name:>9} {seq:>6} {t_fused:10.2f} "
                  f"{naive_s} {ratio}", flush=True)


if __name__ == "__main__":
    main()
