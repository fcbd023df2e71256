"""Fused-vs-plain convergence A/B (r2 VERDICT item 4).

Trains the SAME model twice from the SAME seed on the SAME data stream —
once with the fused Pallas attention, once with the plain XLA path
(use_fused=False) — and reports train/val bpb deltas.  This is the
north-star quality axis the reference proves with enwik8 loss curves
(reference README.md:495-505, train.py:70-73); on this network-less
sandbox it runs on the synthetic corpus, and automatically uses
data/enwik8.gz when present (same loader as train.py).

Usage: python tools/ab_convergence.py --steps 300 [--seq-len 1024]
Appends a result block to TRAINLOG.md.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from train import GRAD_ACCUM, LEARNING_RATE, make_sampler
from flash_cosine_sim_attention_tpu.models import CosineSimCausalTransformer


def run(use_fused, args, n_val_batches=8):
    model = CosineSimCausalTransformer(
        num_tokens=256, dim=args.dim, depth=args.depth,
        max_seq_len=args.seq_len, attn_scale=1.0, attn_l2norm_groups=8,
        use_fused=use_fused, pre_norm=True, dtype=jnp.bfloat16)
    sampler = make_sampler(seed=args.seed)
    rng = jax.random.PRNGKey(args.seed)
    init_batch = jnp.asarray(
        sampler.sample("train", args.batch_size, args.seq_len))
    params = model.init(rng, init_batch, return_loss=True)
    tx = optax.chain(optax.clip_by_global_norm(0.5),
                     optax.adam(LEARNING_RATE))
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, batches):
        def micro(carry, batch):
            loss, grads = jax.value_and_grad(
                lambda p: model.apply(p, batch, return_loss=True))(params)
            return carry, (loss, grads)
        _, (losses, grads) = jax.lax.scan(micro, None, batches)
        grads = jax.tree.map(lambda g: g.mean(0), grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, losses.mean()

    @jax.jit
    def eval_step(params, batch):
        return model.apply(params, batch, return_loss=True)

    stream = sampler.stream("train", GRAD_ACCUM * args.batch_size,
                            args.seq_len)
    losses = []
    t0 = time.time()
    for step in range(args.steps):
        rows = next(stream)
        batches = jnp.asarray(rows).reshape(
            GRAD_ACCUM, args.batch_size, args.seq_len + 1)
        params, opt_state, loss = train_step(params, opt_state, batches)
        if step % 25 == 0 or step == args.steps - 1:
            losses.append((step, float(loss)))
            print(f"  [{'fused' if use_fused else 'plain'}] step {step} "
                  f"loss {float(loss):.4f}", flush=True)
    wall = time.time() - t0

    # validation batches come from the sampler's own deterministic valid
    # split (same seed -> identical across arms)
    val = []
    for _ in range(n_val_batches):
        vb = jnp.asarray(sampler.sample("valid", args.batch_size,
                                        args.seq_len))
        val.append(float(eval_step(params, vb)))
    return losses, float(np.mean(val)), wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--seq-len", type=int, default=1024)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    print("=== arm A: fused Pallas attention ===", flush=True)
    fused_losses, fused_val, fused_wall = run(True, args)
    print("=== arm B: plain XLA attention ===", flush=True)
    plain_losses, plain_val, plain_wall = run(False, args)

    ln2 = float(np.log(2))
    ftr = fused_losses[-1][1] / ln2
    ptr = plain_losses[-1][1] / ln2
    fva, pva = fused_val / ln2, plain_val / ln2
    block = [
        "",
        f"## Fused-vs-plain convergence A/B ({time.strftime('%Y-%m-%d')})",
        "",
        f"Same seed ({args.seed}), same data stream, {args.steps} steps,",
        f"dim {args.dim} depth {args.depth} seq {args.seq_len} bf16,",
        f"backend {jax.default_backend()} (fused arm runs the Pallas "
        "kernels; interpret mode off-TPU, same math),",
        "reference recipe (Adam 2e-4, clip 0.5, grad-accum "
        f"{GRAD_ACCUM}x{args.batch_size}).",
        "",
        "| arm | final train bpb | val bpb | wall (s) |",
        "|---|---|---|---|",
        f"| fused (Pallas) | {ftr:.4f} | {fva:.4f} | {fused_wall:.0f} |",
        f"| plain (XLA)    | {ptr:.4f} | {pva:.4f} | {plain_wall:.0f} |",
        f"| **delta**      | **{abs(ftr-ptr):.4f}** | "
        f"**{abs(fva-pva):.4f}** | {plain_wall/max(fused_wall,1e-9):.2f}x |",
        "",
        "Loss trajectories (step: fused / plain):",
        "",
    ]
    for (s, lf), (_, lp) in zip(fused_losses, plain_losses):
        block.append(f"- step {s}: {lf/ln2:.4f} / {lp/ln2:.4f}")
    text = "\n".join(block) + "\n"
    print(text)
    with open("docs/TRAINLOG.md", "a") as f:
        f.write(text)
    print("appended to docs/TRAINLOG.md")


if __name__ == "__main__":
    main()
