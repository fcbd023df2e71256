"""Serving-engine throughput: steady-state decode tokens/s at full slots,
plus prefill-interleaving latency impact.

Usage:
  python tools/bench_serving.py [--paged] [--slots 8] [--steps 60]
                                [--dim 512] [--depth 8] [--chunked]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--paged", action="store_true")
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--capacity", type=int, default=2048)
    ap.add_argument("--prompt-len", type=int, default=512)
    ap.add_argument("--chunked", action="store_true",
                    help="admit the mid-stream prompt in chunks "
                         "interleaved with decode steps")
    ap.add_argument("--quantize", action="store_true",
                    help="int8-quantize the weight matrices")
    ap.add_argument("--fuse-qkv", action="store_true",
                    help="fuse each layer's q/k/v projections into one "
                         "matmul (fuse_qkv_params)")
    ap.add_argument("--heads", type=int, default=8)
    args = ap.parse_args()

    from flash_cosine_sim_attention_tpu.models import (
        CosineSimCausalTransformer,
    )

    heads = args.heads
    model = CosineSimCausalTransformer(
        num_tokens=256, dim=args.dim, depth=args.depth,
        max_seq_len=args.capacity, heads=heads, dim_head=args.dim // heads,
        attn_scale=1.0, pre_norm=True, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jax.random.randint(rng, (1, 32), 0, 256))
    if args.quantize:
        from flash_cosine_sim_attention_tpu.quant.weights import (
            quantize_params,
        )
        params = quantize_params(params)
    if args.fuse_qkv:
        from flash_cosine_sim_attention_tpu.models import fuse_qkv_params
        params = fuse_qkv_params(params)

    if args.paged:
        from flash_cosine_sim_attention_tpu.serving import (
            PagedInferenceEngine,
        )
        eng = PagedInferenceEngine(
            model, params, num_slots=args.slots, page_size=128,
            num_pages=args.slots * (args.capacity // 128) + 8,
            max_pages_per_slot=args.capacity // 128,
            prompt_buckets=(128, 256, 512, 1024))
    else:
        from flash_cosine_sim_attention_tpu.serving import InferenceEngine
        eng = InferenceEngine(
            model, params, num_slots=args.slots, capacity=args.capacity,
            prompt_buckets=(128, 256, 512, 1024))

    rng_np = np.random.default_rng(0)
    for s in range(args.slots):
        eng.add_request(rng_np.integers(0, 256, 64))
    # warm the decode path
    for _ in range(3):
        eng.step()

    # steady-state decode throughput
    t0 = time.perf_counter()
    for _ in range(args.steps):
        eng.step()
    dt = time.perf_counter() - t0
    tok_s = args.slots * args.steps / dt
    print(f"engine={'paged' if args.paged else 'contiguous'} "
          f"slots={args.slots} dim={args.dim} depth={args.depth}")
    print(f"steady-state decode: {dt/args.steps*1e3:.2f} ms/step  "
          f"{tok_s:,.0f} tokens/s")

    # prefill interleaving: free one slot, admit a long prompt, and watch
    # how long the OTHER slots stall
    eng.finish(0)
    prompt = rng_np.integers(0, 256, args.prompt_len)
    if args.chunked:
        # warm the chunk shapes once, then measure the steady-state
        # admission cost
        slot = eng.add_request(prompt, chunk_tokens=128)
        while not eng.active[slot]:
            eng.step()
        eng.finish(slot)
        stall0 = time.perf_counter()
        slot = eng.add_request(prompt, chunk_tokens=128)
        steps = 0
        while not eng.active[slot]:
            eng.step()     # decode continues while the prompt streams in
            steps += 1
        stall = time.perf_counter() - stall0
        print(f"chunked admission of {args.prompt_len}-token prompt: "
              f"{stall*1e3:.1f} ms total over {steps} interleaved steps, "
              f"{(stall/steps - dt/args.steps)*1e3:.1f} ms/step added "
              f"latency; decode kept running "
              f"(~{steps * args.slots} tokens decoded during admission)")
    else:
        stall0 = time.perf_counter()
        eng.add_request(prompt)
        stall = time.perf_counter() - stall0
        print(f"one-shot admission of {args.prompt_len}-token prompt "
              f"stalls decode for {stall*1e3:.1f} ms "
              f"(= {stall * tok_s:,.0f} decode tokens forgone)")


if __name__ == "__main__":
    main()
