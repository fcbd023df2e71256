"""Biased-vs-unbiased attention benchmark (r2 VERDICT item 3 done-check).

The bias path rides the transposed kernels (one j-major bias^T relayout
shared by fwd + both backward kernels; dB^T folded into the dQ sweep).
This times fwd and fwd+bwd at the headline shape with and without an
attention bias — target: biased fwd+bwd within 15% of unbiased.

Usage: python tools/bench_bias.py [--f32] [--no-causal] [--bbd]
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
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--no-causal", action="store_true")
    ap.add_argument("--bbd", action="store_true",
                    help="batch-dim bias (b, i, j) instead of (h, i, j)")
    args = ap.parse_args()

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    causal = not args.no_causal
    rng = np.random.default_rng(0)
    shape = (args.b, args.h, args.n, args.d)
    q, k, v = (jnp.asarray(rng.standard_normal(shape), dtype)
               for _ in range(3))
    bias_dim = args.b if args.bbd else args.h
    bias = jnp.asarray(
        rng.standard_normal((bias_dim, args.n, args.n)) * 0.5, dtype)

    # the bias rides as a jit ARGUMENT (a closure constant would embed
    # all 268 MB of it in the remote-compile payload -> HTTP 413 on the
    # tunneled backend)
    # the output (fwd) / dQ (fwd+bwd) feeds the next query so the loop is
    # data-dependent (without this XLA hoists the invariant attention call)
    def run_fwd(bias_arg):
        @jax.jit
        def f(n, q, k, v, bias_arg):
            def body(i, q):
                return fcsa.flash_cosine_sim_attention(
                    q, k, v, attn_bias=bias_arg, causal=causal,
                    attn_bias_batch_dim=args.bbd).astype(q.dtype)
            out = jax.lax.fori_loop(0, n, body, q)
            return jnp.sum(out.astype(jnp.float32))
        return _slope_ms(lambda n: f(n, q, k, v, bias_arg), 10)

    def run_fwdbwd(bias_arg):
        has_bias = bias_arg is not None
        argnums = (0, 1, 2, 3) if has_bias else (0, 1, 2)

        @jax.jit
        def f(n, q, k, v, bias_arg):
            def loss(q, k, v, bias_arg):
                o = fcsa.flash_cosine_sim_attention(
                    q, k, v, attn_bias=bias_arg, causal=causal,
                    attn_bias_batch_dim=args.bbd)
                return jnp.sum(o.astype(jnp.float32))
            def body(i, q):
                grads = jax.grad(loss, argnums=argnums)(q, k, v, bias_arg)
                # dq carries the dependence; EVERY other grad must fold
                # into it too — an unconsumed dk/dv lets XLA DCE the
                # entire dKdV pallas_call on the two-pass (biased) path
                # and the "backward" times only the dQ kernel
                dq = grads[0]
                extra = sum(jnp.sum(g.astype(jnp.float32))
                            for g in grads[1:])
                return (dq + extra.astype(dq.dtype)).astype(q.dtype)
            out = jax.lax.fori_loop(0, n, body, q)
            return jnp.sum(out.astype(jnp.float32))
        return _slope_ms(lambda n: f(n, q, k, v, bias_arg), 10)

    t_fwd_u = run_fwd(None)
    t_fwd_b = run_fwd(bias)
    t_fb_u = run_fwdbwd(None)
    t_fb_b = run_fwdbwd(bias)
    print(f"shape {shape} {dtype.__name__} causal={causal} "
          f"bias=({'b' if args.bbd else 'h'}, i, j)")
    ovh = lambda b, u: f"{b / u - 1:+.1%}" if u > 0 else "n/a"
    print(f"| mode | unbiased ms | biased ms | overhead |")
    print(f"|---|---|---|---|")
    print(f"| fwd | {t_fwd_u:.3f} | {t_fwd_b:.3f} | {ovh(t_fwd_b, t_fwd_u)} |")
    print(f"| fwd+bwd | {t_fb_u:.3f} | {t_fb_b:.3f} | {ovh(t_fb_b, t_fb_u)} |")


if __name__ == "__main__":
    main()
