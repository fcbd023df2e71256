"""Block-size tuning sweep on the real TPU.

Times fwd-only and fwd+bwd for the headline config across block-size
candidates.  Not part of the package — a developer tool.
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from flash_cosine_sim_attention_tpu import flash_cosine_sim_attention
from flash_cosine_sim_attention_tpu.utils import benchmark


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=4096)
    ap.add_argument("--dim-head", type=int, default=64)
    ap.add_argument("--causal", action="store_true", default=True)
    ap.add_argument("--no-causal", dest="causal", action="store_false")
    ap.add_argument("--num-times", type=int, default=20)
    args = ap.parse_args()

    b, h, seq, d = 4, 8, args.seq, args.dim_head
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, seq, d)), dtype)
               for _ in range(3))

    configs = [
        (None, None),        # tuned default
        (512, 512),
        (1024, 512),
        (1024, 1024),
        (512, 1024),
        (2048, 512),
    ]
    seen = set()
    for bq, bk in configs:
        key = (bq, bk)
        if key in seen:
            continue
        seen.add(key)
        try:
            fn = lambda q, k, v: flash_cosine_sim_attention(
                q, k, v, causal=args.causal, block_q=bq, block_k=bk)
            t_f = benchmark(fn, q, k, v, forwards=True, backwards=False,
                            num_times=args.num_times)
            t_fb = benchmark(fn, q, k, v, forwards=True, backwards=True,
                             num_times=args.num_times)
            print(f"bq={bq} bk={bk}: fwd {t_f:.3f} ms   fwd+bwd {t_fb:.3f} ms",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"bq={bq} bk={bk}: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
