"""Backward-kernel microbench + block sweep (real TPU).

Times the transposed backward at the headline shape, decomposed into the
dQ pass and the dKdV pass: a timing loop that consumes ONLY dq lets XLA
dead-code-eliminate the dKdV pallas_call (they are independent calls), so
  t(dq-only)        = dQ pass
  t(all) - t(dq)    = dKdV pass
Usage:
  python tools/bench_bwd.py                      # time current blocks
  python tools/bench_bwd.py --sweep              # sweep (bo, bko, bki)
  python tools/bench_bwd.py --f32                # f32 instead of bf16
"""

import argparse
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
    ap.add_argument("--sweep", action="store_true")
    ap.add_argument("--sweep-kv", action="store_true",
                    help="sweep the dKdV triple (dQ triple from --blocks)")
    ap.add_argument("--blocks", type=str, default=None,
                    help="bo,bko,bki triple to time (dQ kernel)")
    ap.add_argument("--blocks-kv", type=str, default=None,
                    help="bo,bko,bki triple for the dKdV kernel")
    ap.add_argument("--blocks-f", type=str, default=None,
                    help="bk,bqi pair for the ONE-pass fused kernel")
    ap.add_argument("--sweep-fused", action="store_true",
                    help="sweep the fused kernel's (bk, bqi)")
    ap.add_argument("--dkdv-narrow-ab", action="store_true",
                    help="within-process A/B of FCSA_DKDV_NARROW")
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

    def timed(blocks_t, what="all", blocks_t_kv=None, blocks_f=None):
        @jax.jit
        def run(n, do, o, inv_l, q, k, v):
            def body(i, do):
                dq, dk, dv, _ = flash_attention_backward(
                    do, o, inv_l, q, k, v, None, None,
                    bias_batch_dim=False, scale=8.0, causal=causal,
                    blocks_t=blocks_t, blocks_t_kv=blocks_t_kv,
                    blocks_f=blocks_f)
                out = dq.astype(jnp.float32)
                if what == "all":
                    out = out + jnp.sum(dk.astype(jnp.float32)) \
                        + jnp.sum(dv.astype(jnp.float32))
                return out.astype(do.dtype)
            out = jax.lax.fori_loop(0, n, body, do)
            return jnp.sum(out.astype(jnp.float32))
        return _slope_ms(lambda n: run(n, q, o, inv_l, q, k, v), 20)

    blocks = (tuple(int(x) for x in args.blocks.split(","))
              if args.blocks else None)
    blocks_kv = (tuple(int(x) for x in args.blocks_kv.split(","))
                 if args.blocks_kv else None)
    blocks_f = (tuple(int(x) for x in args.blocks_f.split(","))
                if args.blocks_f else None)

    if args.sweep_fused:
        best = (None, 1e9)
        for bk in (256, 512, 1024, 2048):
            for bqi in (256, 512, 1024, 2048):
                if bk > args.n or bqi > args.n:
                    continue
                try:
                    t = timed(None, "all", None, (bk, bqi))
                except Exception as e:
                    print(f"bk={bk} bqi={bqi}: FAIL {type(e).__name__}",
                          flush=True)
                    continue
                print(f"bk={bk} bqi={bqi}: {t:.3f} ms", flush=True)
                if t < best[1]:
                    best = ((bk, bqi), t)
        print("BEST", best)
        return

    if blocks_f is not None:
        t = timed(None, "all", None, blocks_f)
        print(f"shape {shape} {dtype.__name__} causal={causal} "
              f"ONE-pass fused blocks_f={blocks_f}: {t:.3f} ms")
        return

    if args.sweep or args.sweep_kv:
        # --sweep varies the dQ triple (timing the dq-only slice so the
        # dKdV pass DCEs away); --sweep-kv varies the dKdV triple with
        # the dQ triple pinned (timing all minus the pinned dq time)
        best = (None, 1e9)
        t_dq_pinned = timed(blocks, "dq", None) if args.sweep_kv else None
        if t_dq_pinned is not None:
            print(f"pinned dQ pass ({blocks}): {t_dq_pinned:.3f} ms",
                  flush=True)
        for bo in (256, 512, 1024, 2048):
            for bko in (1024, 2048, 4096):
                for bki in (256, 512, 1024, 2048):
                    if bki > bko or bko % bki or bo > args.n or bko > args.n:
                        continue
                    try:
                        if args.sweep_kv:
                            t = timed(blocks, "all", (bo, bko, bki)) \
                                - t_dq_pinned
                        else:
                            t = timed((bo, bko, bki), "dq")
                    except Exception as e:
                        print(f"bo={bo} bko={bko} bki={bki}: FAIL "
                              f"{type(e).__name__}", flush=True)
                        continue
                    print(f"bo={bo} bko={bko} bki={bki}: {t:.3f} ms",
                          flush=True)
                    if t < best[1]:
                        best = ((bo, bko, bki), t)
        print("BEST", best)
        return
    if args.dkdv_narrow_ab:
        # within-process A/B: each timed() builds a fresh jitted closure,
        # so the env flag is re-read at trace time
        import os
        for narrow in ("0", "1"):
            os.environ["FCSA_DKDV_NARROW"] = narrow
            t_all = timed(blocks, "all", blocks_kv)
            t_dq = timed(blocks, "dq", blocks_kv)
            print(f"narrow={narrow}: bwd total {t_all:.3f} ms | "
                  f"dQ {t_dq:.3f} | dKdV {t_all - t_dq:.3f} ms", flush=True)
        return
    t_all = timed(blocks, "all", blocks_kv)
    t_dq = timed(blocks, "dq", blocks_kv)
    print(f"shape {shape} {dtype.__name__} causal={causal} "
          f"blocks={blocks} blocks_kv={blocks_kv}")
    print(f"bwd total {t_all:.3f} ms | dQ pass {t_dq:.3f} ms | "
          f"dKdV pass {t_all - t_dq:.3f} ms")


if __name__ == "__main__":
    main()
