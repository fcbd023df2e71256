"""Full benchmark sweep -> committed artifact (docs/BENCHMARKS.md).

Reproduces the reference README's complete table set
(reference README.md:237-492: fwd/bwd/fwd+bwd x plain/causal/masked
x two dtypes x seq 128..8192) on TPU, adding the MFU column the
reference never had.  One process so every number shares a device
session; compiles dominate the wall time (~100+ distinct shapes).

Usage:
  python tools/bench_sweep.py [--out docs/BENCHMARKS.md]
                              [--seq-lens ...] [--num-times 20]
"""

import argparse
import importlib.util
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

spec = importlib.util.spec_from_file_location(
    "root_benchmark", os.path.join(REPO, "benchmark.py"))
root_bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(root_bench)

import jax
import jax.numpy as jnp
import numpy as np

from flash_cosine_sim_attention_tpu import flash_cosine_sim_attention
from flash_cosine_sim_attention_tpu.utils import benchmark
from flash_cosine_sim_attention_tpu.utils.benchmark import (
    xla_naive_cosine_sim_attention,
)

BATCH, HEADS, DIM_HEAD = 4, 8, 64

VARIANTS = [
    ("plain", dict(causal=False, mask_prob=0.0)),
    ("causal", dict(causal=True, mask_prob=0.0)),
    ("masked-25%", dict(causal=False, mask_prob=0.25)),
]
MODES = [
    ("fwd", dict(forwards=True, backwards=False)),
    ("bwd", dict(forwards=False, backwards=True)),
    ("fwd+bwd", dict(forwards=True, backwards=True)),
]


def run_cell(dtype, seq, causal, mask_prob, fwd, bwd, num_times, rng):
    q, k, v = (jnp.asarray(
        rng.standard_normal((BATCH, HEADS, seq, DIM_HEAD)), dtype)
        for _ in range(3))
    mask = (jnp.asarray(rng.random((BATCH, seq)) > mask_prob)
            if mask_prob > 0 else None)

    fused = lambda q, k, v: flash_cosine_sim_attention(
        q, k, v, mask=mask, causal=causal)
    naive = lambda q, k, v: xla_naive_cosine_sim_attention(
        q, k, v, mask=mask, causal=causal)

    t_fused = benchmark(fused, q, k, v, forwards=fwd, backwards=bwd,
                        num_times=num_times)
    n_bufs = 4 if bwd else 2
    est = BATCH * HEADS * seq * seq * 4 * n_bufs
    free = root_bench.device_free_bytes()
    t_naive = None
    if est < (free * 0.9 if free is not None else 13e9):
        try:
            t_naive = benchmark(naive, q, k, v, forwards=fwd,
                                backwards=bwd, num_times=num_times)
        except Exception:
            t_naive = None
    return t_fused, t_naive


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "docs",
                                                  "BENCHMARKS.md"))
    ap.add_argument("--json-out", default=os.path.join(REPO, "docs",
                                                       "benchmarks.json"))
    ap.add_argument("--num-times", type=int, default=20)
    ap.add_argument("--seq-lens", type=int, nargs="*",
                    default=[128, 256, 512, 1024, 2048, 4096, 8192])
    args = ap.parse_args()

    dev = jax.devices()[0].device_kind
    peak = root_bench.device_peak_flops()
    rng = np.random.default_rng(0)
    t0 = time.time()

    lines = [
        "# Full benchmark sweep",
        "",
        f"Device: **{dev}** (1 chip), batch {BATCH} x heads {HEADS} x "
        f"dim_head {DIM_HEAD}; times in ms.",
        "",
        "Baseline (`naive`) is the XLA-compiled unfused einsum cosine-sim",
        "attention — what a user writes without the kernel (the analogue",
        "of the reference's `simplified_cosine_sim_attention` baseline,",
        "reference README.md:237-492).  `oom` = the materialized",
        "(b, h, s, s) logits would not fit HBM (gated by a device memory",
        "query; provoking the OOM kills the tunneled worker).",
        "",
        "MFU counts algorithmic FLOPs only (fwd `4*b*h*s^2*d`, bwd x2.5,",
        "fwd+bwd x3.5, halved when causal — backward recompute is NOT",
        "credited) against the chip's bf16 peak, for f32 rows too: f32",
        "MXU passes cost ~6x on this chip, so low f32 MFU is the silicon,",
        "not the kernel.  At dim_head 64 the QK contraction half-fills",
        "the 128-deep MXU, capping achievable MFU near 50% forward.",
        "",
    ]
    results = []
    for vname, vcfg in VARIANTS:
        for mname, mcfg in MODES:
            lines += [f"## {vname} — {mname}", "",
                      "| dtype | seq | fused ms | MFU | naive ms | "
                      "fused/naive |",
                      "|---|---|---|---|---|---|"]
            for dtype in (jnp.float32, jnp.bfloat16):
                for seq in args.seq_lens:
                    t_fused, t_naive = run_cell(
                        dtype, seq, vcfg["causal"], vcfg["mask_prob"],
                        mcfg["forwards"], mcfg["backwards"],
                        args.num_times, rng)
                    # tiny shapes can slope-measure to ~0 ms (RPC noise
                    # floor); clamp for the rate math
                    mfu = root_bench.attention_flops(
                        seq, mname, vcfg["causal"]) / (
                        max(t_fused, 1e-3) * 1e-3) / peak
                    if t_naive is None:
                        nv, ratio = "oom", "—"
                    else:
                        nv = f"{t_naive:.2f}"
                        ratio = f"{t_fused / max(t_naive, 1e-3):.2f}x"
                    dn = jnp.dtype(dtype).name
                    lines.append(
                        f"| {dn} | {seq} | {t_fused:.2f} | {mfu:.1%} | "
                        f"{nv} | {ratio} |")
                    results.append(dict(
                        variant=vname, mode=mname, dtype=dn, seq=seq,
                        fused_ms=round(t_fused, 3), mfu=round(mfu, 4),
                        naive_ms=(None if t_naive is None
                                  else round(t_naive, 3))))
                    print(f"[{time.time()-t0:7.0f}s] {vname:10s} "
                          f"{mname:7s} {dn:8s} {seq:5d}: "
                          f"fused {t_fused:8.2f}  naive "
                          f"{nv:>8}", flush=True)
            lines.append("")

    lines.append(f"Generated by tools/bench_sweep.py in "
                 f"{(time.time()-t0)/60:.0f} min.")
    # preserve the hand-maintained appendix (bias / int8-QK / decode
    # sections measured by the dedicated tools) across regenerations
    appendix = ""
    marker = "<!-- appendix -->"
    if os.path.exists(args.out):
        with open(args.out) as f:
            old = f.read()
        if marker in old:
            appendix = old[old.index(marker):]
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
        if appendix:
            f.write("\n" + appendix)
    with open(args.json_out, "w") as f:
        json.dump({"device": dev, "results": results}, f, indent=1)
    print(f"wrote {args.out} and {args.json_out}")


if __name__ == "__main__":
    main()
