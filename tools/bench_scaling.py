"""Training-throughput benchmark: tokens/s for the sharded train step.

On one chip this measures single-device throughput; on a multi-chip
slice the same script measures scaling efficiency (tokens/s vs the
1-chip number — north-star target: >= 85% at 2+ hosts).  The mesh shape
is picked by make_mesh (TP within a host's ICI domain, DP across).

Usage:
  python tools/bench_scaling.py [--seq-len 1024] [--batch-per-device 4]
                                [--model-parallel N] [--steps 20]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from flash_cosine_sim_attention_tpu.models import CosineSimCausalTransformer
from flash_cosine_sim_attention_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    shard_params,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq-len", type=int, default=1024)
    ap.add_argument("--batch-per-device", type=int, default=4)
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--model-parallel", type=int, default=None)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev, model_parallel=args.model_parallel)
    data_par = mesh.shape["data"]
    batch = args.batch_per_device * data_par

    model = CosineSimCausalTransformer(
        num_tokens=256, dim=args.dim, depth=args.depth,
        max_seq_len=args.seq_len, attn_scale=1.0, attn_l2norm_groups=8,
        pre_norm=True, dtype=jnp.bfloat16, mesh=mesh)

    rng = jax.random.PRNGKey(0)
    x = jax.random.randint(rng, (batch, args.seq_len + 1), 0, 256)
    params = shard_params(model.init(rng, x, return_loss=True), mesh)
    tx = optax.chain(optax.clip_by_global_norm(0.5), optax.adam(2e-4))
    opt_state = tx.init(params)
    step = make_sharded_train_step(model, tx, mesh)

    # warm up (compile) then time; two steps: the first step's outputs
    # carry GSPMD-inferred shardings that differ from the hand-placed
    # inputs, so the second call compiles once more before stabilizing.
    # Completion is forced with a device-to-host scalar fetch —
    # block_until_ready does NOT await execution on the tunneled backend.
    for _ in range(2):
        params, opt_state, loss = step(params, opt_state, x)
        float(loss)

    def run(n):
        nonlocal params, opt_state
        t0 = time.perf_counter()
        loss = None
        for _ in range(n):
            params, opt_state, loss = step(params, opt_state, x)
        f = float(loss)
        return time.perf_counter() - t0, f

    n_short = max(args.steps // 3, 1)
    (t_short, _), (t_long, loss_f) = run(n_short), run(args.steps)
    dt = (t_long - t_short) / (args.steps - n_short)

    print(f"devices={n_dev} mesh=(data={data_par}, "
          f"model={mesh.shape['model']}) batch={batch} "
          f"seq={args.seq_len}")
    print(f"step time: {dt * 1e3:.2f} ms   "
          f"throughput: {batch * args.seq_len / dt:,.0f} tokens/s   "
          f"loss={loss_f:.4f}")


if __name__ == "__main__":
    main()
