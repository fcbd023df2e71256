"""enwik8 char-LM training driver (TPU-native rebuild of reference train.py).

Reference semantics (train.py:17-133): batch 4, grad-accum 4, Adam lr 2e-4,
grad-clip 0.5, validate every 100 steps, generate every 500, model dim 512 /
depth 8 / attn scale 1 with 8 l2norm groups, pre-norm, enwik8 90M/5M split.

TPU-native differences: optax optimizer chain instead of torch Adam+AMP
GradScaler (bf16 needs no loss scaling), one jitted step that scans over the
grad-accum microbatches, and jax PRNG data sampling.  If ``data/enwik8.gz``
is absent (this sandbox has no network), a deterministic synthetic byte
corpus stands in so the driver stays runnable end-to-end.

Usage:
  python train.py --seq-len 1024 --steps 1000 [--use-float32] [--no-fused]
"""

from __future__ import annotations

import argparse
import gzip
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from flash_cosine_sim_attention_tpu.data import TextSampler
from flash_cosine_sim_attention_tpu.models import (
    CosineSimCausalTransformer,
    generate,
)
from flash_cosine_sim_attention_tpu.utils import (
    restore_checkpoint,
    save_checkpoint,
)

# constants mirroring reference train.py:25-31
BATCH_SIZE = 4
GRAD_ACCUM = 4
LEARNING_RATE = 2e-4
VALIDATE_EVERY = 100
GENERATE_EVERY = 500
GENERATE_LENGTH = 512


def make_sampler(path="data/enwik8.gz", seed=0) -> TextSampler:
    """enwik8 90M/5M split (ref train.py:70-73) through the native C++
    loader; deterministic synthetic corpus fallback (zero-egress sandbox)."""
    if not os.path.exists(path):
        synth = "data/synthetic.raw"
        if not os.path.exists(synth):
            print("data/enwik8.gz not found - generating deterministic "
                  "synthetic byte corpus (drop enwik8.gz into data/ for the "
                  "real benchmark)")
            rng = np.random.default_rng(0)
            # order-1 Markov text over a small alphabet: learnable structure
            vocab = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz .,\n",
                                  np.uint8)
            trans = rng.dirichlet(np.full(len(vocab), 0.1), size=len(vocab))
            size = int(8e6)
            cum = np.cumsum(trans, axis=1)
            u = rng.random(size)
            states = np.zeros(size, np.int64)
            st = 0
            for i in range(size):
                st = min(int(np.searchsorted(cum[st], u[i])), len(vocab) - 1)
                states[i] = st
            os.makedirs("data", exist_ok=True)
            with open(synth, "wb") as f:
                f.write(vocab[states].tobytes())
        path = synth
    sampler = TextSampler(path, train_frac=90 / 95, seed=seed)
    print(f"data: {path}  loader backend: {sampler.backend}  "
          f"bytes: {sampler._c.size:,}")
    return sampler


def decode_bytes(tokens) -> str:
    return "".join(chr(max(32, int(t))) for t in tokens)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--use-float32", action="store_true",
                    help="f32 compute (default bf16, the TPU-native AMP)")
    ap.add_argument("--no-fused", action="store_true",
                    help="use the plain XLA attention instead of Pallas")
    ap.add_argument("--seq-len", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=int(1e5))
    ap.add_argument("--batch-size", type=int, default=BATCH_SIZE)
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--checkpoint-dir", type=str, default="",
                    help="save/resume checkpoints here (orbax)")
    ap.add_argument("--checkpoint-every", type=int, default=1000)
    ap.add_argument("--model-parallel", type=int, default=0,
                    help="shard over a (data, model) mesh (0 = single "
                         "device); heads/MLP shard over `model`, batch "
                         "over `data`")
    ap.add_argument("--pipeline-parallel", type=int, default=0,
                    help="GPipe pipeline over a (data, pipe) mesh: depth "
                         "splits into this many stages, the GRAD_ACCUM "
                         "microbatches become the pipeline schedule "
                         "(exclusive with --model-parallel/multi-host)")
    ap.add_argument("--coordinator", type=str, default="",
                    help="multi-host: coordinator address host:port "
                         "(empty = auto-detect on TPU pods)")
    ap.add_argument("--num-processes", type=int, default=1,
                    help="multi-host: total process count (1 = single "
                         "process)")
    ap.add_argument("--process-id", type=int, default=-1,
                    help="multi-host: this process's id (-1 = auto)")
    args = ap.parse_args()

    dtype = jnp.float32 if args.use_float32 else jnp.bfloat16

    distributed = args.num_processes > 1
    if distributed:
        from flash_cosine_sim_attention_tpu.parallel import (
            initialize_distributed,
        )

        initialize_distributed(
            coordinator_address=args.coordinator or None,
            num_processes=args.num_processes,
            process_id=args.process_id if args.process_id >= 0 else None,
        )

    is_main = jax.process_index() == 0

    mesh = None
    if distributed:
        from flash_cosine_sim_attention_tpu.parallel import (
            make_multihost_mesh,
        )

        mesh = make_multihost_mesh(
            model_parallel=args.model_parallel or None)
        if is_main:
            print(f"processes: {jax.process_count()}  mesh: "
                  f"data={mesh.shape['data']} model={mesh.shape['model']}")
    elif args.model_parallel > 1:
        from flash_cosine_sim_attention_tpu.parallel import make_mesh

        mesh = make_mesh(model_parallel=args.model_parallel)
        print(f"mesh: data={mesh.shape['data']} "
              f"model={mesh.shape['model']}")

    # model config mirrors reference train.py:53-64
    model = CosineSimCausalTransformer(
        num_tokens=256,
        dim=args.dim,
        depth=args.depth,
        max_seq_len=args.seq_len,
        attn_scale=1.0,
        attn_l2norm_groups=8,
        use_fused=not args.no_fused,
        pre_norm=True,
        dtype=dtype,
        mesh=mesh,
    )

    # per-process sampling streams (multi-host: each process draws only
    # its own rows; the streams are decorrelated by the process index)
    sampler = make_sampler(seed=args.seed + 1009 * jax.process_index())
    rng = jax.random.PRNGKey(args.seed)

    init_batch = jnp.asarray(
        sampler.sample("train", args.batch_size, args.seq_len))
    params = model.init(rng, init_batch, return_loss=True)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"params: {n_params/1e6:.1f}M  dtype: {dtype.__name__}  "
          f"fused: {not args.no_fused}")

    tx = optax.chain(
        optax.clip_by_global_norm(0.5),      # ref train.py:114
        optax.adam(LEARNING_RATE),
    )
    opt_state = tx.init(params)

    pp = args.pipeline_parallel
    if pp > 1:
        # GPipe pipeline mode: the param tree becomes (stacked_layers,
        # aux); GRAD_ACCUM microbatches drive the pipeline schedule, so
        # one train_step call keeps the reference's grad-accum semantics
        # (mean loss / mean grads over GRAD_ACCUM microbatches)
        assert mesh is None and not distributed, (
            "--pipeline-parallel is exclusive with --model-parallel / "
            "multi-host in this driver")
        from flash_cosine_sim_attention_tpu.parallel import (
            make_pipeline_mesh,
            make_pipeline_train_step,
            merge_pipeline_params,
            shard_pipeline_params,
            split_pipeline_params,
        )

        n_dev = len(jax.devices())
        n_dev -= n_dev % pp
        pipe_mesh = make_pipeline_mesh(n_dev, pipeline_parallel=pp)
        data_sz = n_dev // pp
        assert args.batch_size % max(data_sz, 1) == 0, (
            args.batch_size, data_sz)
        print(f"pipeline mesh: data={data_sz} pipe={pp} "
              f"(n_micro={GRAD_ACCUM})")
        params = shard_pipeline_params(
            *split_pipeline_params(model, params, pp), pipe_mesh)
        opt_state = tx.init(params)

    start_step = 0
    if args.checkpoint_dir:
        ck_step, params, opt_state = restore_checkpoint(
            args.checkpoint_dir, params, opt_state)
        if ck_step is not None:
            start_step = ck_step + 1
            print(f"resumed from step {ck_step}")

    if mesh is not None:
        from flash_cosine_sim_attention_tpu.parallel import (
            shard_opt_state,
            shard_params,
        )

        params = shard_params(params, mesh)
        # reshard the EXISTING opt_state (restored moments survive a
        # --model-parallel resume; tx.init here would discard them)
        opt_state = shard_opt_state(tx, opt_state, params, mesh)

    if distributed:
        from flash_cosine_sim_attention_tpu.parallel import (
            local_batch_to_global,
            process_local_rows,
        )

        local_bs = process_local_rows(args.batch_size)

        def make_batches(rows):
            """(GRAD_ACCUM*local_bs, L) local rows -> global sharded
            (GRAD_ACCUM, batch, L); the microbatch axis is unsharded."""
            L = args.seq_len + 1
            return local_batch_to_global(
                mesh, rows.reshape(GRAD_ACCUM, local_bs, L), batch_axis=1)

        def make_eval_batch(rows):
            return local_batch_to_global(mesh, rows, batch_axis=0)
    else:
        local_bs = args.batch_size
        make_batches = lambda rows: jnp.asarray(rows).reshape(
            GRAD_ACCUM, args.batch_size, args.seq_len + 1)
        make_eval_batch = jnp.asarray

    @jax.jit
    def train_step(params, opt_state, batches):
        """One optimizer step over GRAD_ACCUM microbatches (train.py:106-110)."""
        def micro(carry, batch):
            loss, grads = jax.value_and_grad(
                lambda p: model.apply(p, batch, return_loss=True))(params)
            return carry, (loss, grads)

        _, (losses, grads) = jax.lax.scan(micro, None, batches)
        grads = jax.tree.map(lambda g: g.mean(0), grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, losses.mean()

    @jax.jit
    def eval_step(params, batch):
        return model.apply(params, batch, return_loss=True)

    if pp > 1:
        # pipeline overrides: tokens stay a flat (GRAD_ACCUM*batch, L)
        # block (the loss fn splits microbatches itself); eval/generate
        # run the plain model on merged params
        make_batches = lambda rows: jnp.asarray(rows).reshape(
            GRAD_ACCUM * args.batch_size, args.seq_len + 1)
        train_step = make_pipeline_train_step(
            model, tx, pipe_mesh, n_micro=GRAD_ACCUM)
        _plain_eval = eval_step

        def eval_step(pparams, batch):  # noqa: F811
            merged = merge_pipeline_params(model, *pparams)
            return _plain_eval(merged, batch)

    t_start = time.time()
    train_stream = sampler.stream(
        "train", GRAD_ACCUM * local_bs, args.seq_len)
    for step in range(start_step, args.steps):
        batches = make_batches(next(train_stream))
        params, opt_state, loss = train_step(params, opt_state, batches)

        if step % 10 == 0 and is_main:
            loss = float(loss)
            bpb = loss / np.log(2)
            toks = (step + 1) * GRAD_ACCUM * args.batch_size * args.seq_len
            rate = toks / (time.time() - t_start)
            print(f"step {step}  loss {loss:.4f}  bpb {bpb:.4f}  "
                  f"tok/s {rate:,.0f}", flush=True)

        if step % VALIDATE_EVERY == 0 and step > 0:
            vb = make_eval_batch(
                sampler.sample("valid", local_bs, args.seq_len))
            vl = float(eval_step(params, vb))
            if is_main:
                print(f"valid loss {vl:.4f}  valid bpb {vl/np.log(2):.4f}",
                      flush=True)

        if (args.checkpoint_dir and step > 0
                and step % args.checkpoint_every == 0):
            save_checkpoint(args.checkpoint_dir, step, params, opt_state)
            if is_main:
                print(f"checkpoint saved at step {step}", flush=True)

        if step % GENERATE_EVERY == 0 and step > 0 and distributed:
            # autoregressive sampling is a data-dependent host loop; skip
            # it under SPMD multi-process (every process would have to
            # run it in lockstep for no benefit)
            continue
        if step % GENERATE_EVERY == 0 and step > 0:
            prime = jnp.asarray(
                sampler.sample("valid", 1, args.seq_len))[:, :128]
            rng, sub = jax.random.split(rng)
            gen_params = (merge_pipeline_params(model, *params)
                          if pp > 1 else params)
            out = generate(model, gen_params, sub, prime, GENERATE_LENGTH)
            print("prime:", decode_bytes(np.asarray(prime)[0][-64:]))
            print("generated:", decode_bytes(np.asarray(out)[0][:256]),
                  flush=True)


if __name__ == "__main__":
    main()
