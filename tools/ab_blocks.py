"""Interleaved A/B of kernel block configs (drift-robust).

Cross-process timings on the tunneled TPU drift 20-100%, and even
within a process the chip's clock can move between measurements.  This
tool times a list of configs ROUND-ROBIN for several rounds and reports
per-config medians-of-rounds, so slow phases hit every arm equally.

Usage:
  python tools/ab_blocks.py --what dq  --configs 1024,4096,1024 1024,4096,512 1024,4096,256
  python tools/ab_blocks.py --what kv  --configs 1024,4096,1024 1024,4096,512
  python tools/ab_blocks.py --what fwd --configs 1024,4096,1024 1024,4096,512
  python tools/ab_blocks.py --what fb  --configs ...   # full fwd+bwd, FCSA env triple
"""

import argparse
import statistics
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from flash_cosine_sim_attention_tpu.ops.bwd_kernel import (
    flash_attention_backward,
)
from flash_cosine_sim_attention_tpu.ops.fwd_kernel import (
    flash_attention_forward,
)
from flash_cosine_sim_attention_tpu.ops.reference import l2norm_tensors
from flash_cosine_sim_attention_tpu.utils.benchmark import _slope_ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=4)
    ap.add_argument("--h", type=int, default=8)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--no-causal", action="store_true")
    ap.add_argument("--what", choices=("dq", "kv", "fwd", "bwd"),
                    default="dq")
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--configs", nargs="+", required=True)
    args = ap.parse_args()

    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    causal = not args.no_causal
    rng = np.random.default_rng(0)
    shape = (args.b, args.h, args.n, args.d)
    q, k, v = (jnp.asarray(rng.standard_normal(shape), dtype)
               for _ in range(3))
    q, k = l2norm_tensors(q, k)
    o, inv_l = jax.jit(
        lambda q, k, v: flash_attention_forward(
            q, k, v, None, None, bias_batch_dim=False, scale=8.0,
            causal=causal))(q, k, v)
    configs = [tuple(int(x) for x in c.split(",")) for c in args.configs]

    def make_loop(cfg):
        if args.what == "fwd":
            # the fwd triple is env-driven (pick_fwd_blocks_t); set it
            # before the trace-compiling first call, restore after
            import os

            @jax.jit
            def run(n, q, k, v):
                def body(i, q):
                    o, _ = flash_attention_forward(
                        q, k, v, None, None, bias_batch_dim=False,
                        scale=8.0, causal=causal)
                    return o.astype(q.dtype)
                return jnp.sum(jax.lax.fori_loop(0, n, body, q)
                               .astype(jnp.float32))

            def loop(n, cfg=cfg):
                for name, val in zip(("BQ", "BKO", "BKI"), cfg):
                    os.environ[f"FCSA_FWD_{name}"] = str(val)
                try:
                    return run(n, q, k, v)
                finally:
                    for name in ("BQ", "BKO", "BKI"):
                        os.environ.pop(f"FCSA_FWD_{name}", None)
            return loop

        what = args.what

        @jax.jit
        def run(n, do, o, inv_l, q, k, v):
            def body(i, do):
                bt = cfg if what in ("dq", "bwd") else None
                btkv = cfg if what in ("kv", "bwd") else None
                dq, dk, dv, _ = flash_attention_backward(
                    do, o, inv_l, q, k, v, None, None,
                    bias_batch_dim=False, scale=8.0, causal=causal,
                    blocks_t=bt, blocks_t_kv=btkv)
                out = dq.astype(jnp.float32)
                if what != "dq":
                    out = out + jnp.sum(dk.astype(jnp.float32)) \
                        + jnp.sum(dv.astype(jnp.float32))
                return out.astype(do.dtype)
            out = jax.lax.fori_loop(0, n, body, do)
            return jnp.sum(out.astype(jnp.float32))
        return lambda n: run(n, q, o, inv_l, q, k, v)

    loops = {}
    for cfg in configs:
        try:
            loop = make_loop(cfg)
            float(loop(2))  # compile
            loops[cfg] = loop
        except Exception as e:  # noqa: BLE001
            print(f"{cfg}: FAIL {type(e).__name__}: {str(e)[:80]}",
                  flush=True)
    results = {cfg: [] for cfg in loops}
    for r in range(args.rounds):
        for cfg, loop in loops.items():
            t = _slope_ms(loop, 20, trials=1)
            results[cfg].append(t)
            print(f"round {r} {cfg}: {t:.3f} ms", flush=True)
    print("--- medians ---")
    for cfg, ts in sorted(results.items(),
                          key=lambda kv: statistics.median(kv[1])):
        print(f"{cfg}: {statistics.median(ts):.3f} ms "
              f"(min {min(ts):.3f}, max {max(ts):.3f})")


if __name__ == "__main__":
    main()
