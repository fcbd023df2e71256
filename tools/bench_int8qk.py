"""int8-QK prefill benchmark (r2 VERDICT item 7).

Measures the quantized-QK forward (qk_int8=True: Q/K quantized to int8 at
the fixed cosine-sim scale 127, scores dequantized by 1/127^2 inside the
exp epilogue) against the bf16 fused forward at prefill shapes, plus an
error budget vs the f32 oracle.

Usage: python tools/bench_int8qk.py [--d 64] [--causal]
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import flash_cosine_sim_attention_tpu as fcsa
from flash_cosine_sim_attention_tpu.utils.benchmark import _slope_ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=4)
    ap.add_argument("--h", type=int, default=8)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--causal", action="store_true")
    ap.add_argument("--seq-lens", type=str, default="1024,2048,4096,8192")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    print(f"int8-QK vs bf16 fused fwd  (b{args.b} h{args.h} d{args.d} "
          f"causal={args.causal})")
    print("| seq | bf16 ms | int8-QK ms | speedup | int8 maxerr | "
          "bf16 maxerr |")
    print("|---|---|---|---|---|---|")
    for n in (int(x) for x in args.seq_lens.split(",")):
        shape = (args.b, args.h, n, args.d)
        q, k, v = (jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
                   for _ in range(3))

        def timed(qk_int8):
            # the output feeds the next query (l2norm inside re-normalizes)
            # so the loop is data-dependent — without this XLA hoists the
            # loop-invariant attention call and the slope measures zero
            @jax.jit
            def run(steps, q, k, v):
                def body(i, q):
                    return fcsa.flash_cosine_sim_attention(
                        q, k, v, causal=args.causal,
                        qk_int8=qk_int8).astype(q.dtype)
                out = jax.lax.fori_loop(0, steps, body, q)
                return jnp.sum(out.astype(jnp.float32))
            return _slope_ms(lambda s: run(s, q, k, v), 20)

        t_bf16 = timed(False)
        t_int8 = timed(True)

        # error budget vs the f32 oracle (first batch row only: keeps the
        # plain path's logits small)
        qf, kf, vf = (x[:1].astype(jnp.float32) for x in (q, k, v))
        oracle = fcsa.plain_cosine_sim_attention(qf, kf, vf,
                                                 causal=args.causal)
        e_int8 = float(jnp.abs(
            fcsa.flash_cosine_sim_attention(
                q[:1], k[:1], v[:1], causal=args.causal,
                qk_int8=True).astype(jnp.float32) - oracle).max())
        e_bf16 = float(jnp.abs(
            fcsa.flash_cosine_sim_attention(
                q[:1], k[:1], v[:1],
                causal=args.causal).astype(jnp.float32) - oracle).max())
        print(f"| {n} | {t_bf16:.3f} | {t_int8:.3f} | "
              f"{t_bf16 / t_int8:.2f}x | {e_int8:.2e} | {e_bf16:.2e} |",
              flush=True)


if __name__ == "__main__":
    main()
