"""Production-scale decode-step benchmark (the README's 0.81B number).

Slope-times a jitted fori_loop of full decode steps (argmax feedback,
int8 weights, fused QKV, int8 KV cache) at dim 2048 / depth 16 /
16 heads x 128, batch 8, ctx 2048 — device time, which on the tunneled
sandbox backend is the only honest measure (a host-driven engine loop
pays ~25-30 ms RPC per step; see tools/bench_serving.py for that
wall-clock view).

Usage: python tools/bench_prod_decode.py [--dim 2048] [--depth 16]
         [--heads 16] [--batch 8] [--capacity 2048] [--prompt 1024]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from flash_cosine_sim_attention_tpu.models import CosineSimCausalTransformer
from flash_cosine_sim_attention_tpu.models.decoding import (
    decode_step,
    fuse_qkv_params,
    init_decode_state,
    prefill,
)
from flash_cosine_sim_attention_tpu.quant.weights import quantize_params
from flash_cosine_sim_attention_tpu.utils.benchmark import _slope_ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=2048)
    ap.add_argument("--depth", type=int, default=16)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--capacity", type=int, default=2048)
    ap.add_argument("--prompt", type=int, default=1024)
    args = ap.parse_args()

    model = CosineSimCausalTransformer(
        num_tokens=256, dim=args.dim, depth=args.depth,
        max_seq_len=args.capacity, heads=args.heads,
        dim_head=args.dim // args.heads, attn_scale=1.0, pre_norm=True,
        dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jax.random.randint(rng, (1, 32), 0, 256))
    n_par = sum(x.size for x in jax.tree.leaves(params))
    params = fuse_qkv_params(quantize_params(params))
    b = args.batch
    state = init_decode_state(model, b, args.capacity)
    prompt = jax.random.randint(rng, (b, args.prompt), 0, 256)
    _, state = jax.jit(lambda p, s, t: prefill(model, p, s, t))(
        params, state, prompt)

    @jax.jit
    def steps(n, params, state, tok):
        def body(i, carry):
            state, tok = carry
            logits, state = decode_step(model, params, state, tok)
            return state, jnp.argmax(logits, -1).astype(tok.dtype)
        state, tok = jax.lax.fori_loop(0, n, body, (state, tok))
        return tok

    tok0 = jnp.zeros((b,), jnp.int32)
    t = _slope_ms(lambda n: jnp.sum(steps(n, params, state, tok0)), 20)
    print(f"params {n_par/1e9:.2f}B  dim {args.dim} depth {args.depth} "
          f"heads {args.heads}x{args.dim//args.heads} batch {b}: "
          f"decode step {t:.2f} ms  {b/t*1e3:,.0f} tok/s")


if __name__ == "__main__":
    main()
