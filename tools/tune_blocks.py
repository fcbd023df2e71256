"""Block-size tuning sweep on the real TPU.

Times fwd-only and fwd+bwd for the headline config across block-size
candidates.  Not part of the package — a developer tool.
"""

import argparse
import sys

sys.path.insert(0, ".")

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
    ap.add_argument("--f32", action="store_true",
                    help="sweep float32 (its table was never swept)")
    args = ap.parse_args()

    b, h, seq, d = 4, 8, args.seq, args.dim_head
    dtype = jnp.float32 if args.f32 else jnp.bfloat16
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, seq, d)), dtype)
               for _ in range(3))

    # transposed-kernel sweep: (lane block, outer streamed block, inner
    # sub-tile) set through the FCSA env overrides (ops/blocks.py)
    import os

    import flash_cosine_sim_attention_tpu as fcsa

    configs = [
        None,                 # tuned defaults
        (512, 4096, 512),
        (512, 2048, 512),
        (1024, 4096, 512),    # causal lane-narrowing arm (ncase=2)
        (1024, 4096, 256),    # causal lane-narrowing arm (ncase=4)
        (1024, 4096, 1024),   # big lanes, no narrowing (dQ's r3 winner)
        (2048, 4096, 512),    # causal lane-narrowing arm (ncase=4)
        (512, 4096, 256),
        (256, 4096, 512),
    ]
    for cfg in configs:
        for var in list(os.environ):
            if var.startswith("FCSA_"):
                del os.environ[var]
        if cfg is not None:
            for side in ("FWD", "BWD"):
                for name, val in zip(("BQ", "BKO", "BKI"), cfg):
                    os.environ[f"FCSA_{side}_{name}"] = str(val)
        # env is read at trace time: drop every cached specialization
        fcsa.ops.flash_attention._make_fused.cache_clear()
        jax.clear_caches()
        try:
            fn = lambda q, k, v: flash_cosine_sim_attention(
                q, k, v, causal=args.causal)
            t_f = benchmark(fn, q, k, v, forwards=True, backwards=False,
                            num_times=args.num_times)
            t_fb = benchmark(fn, q, k, v, forwards=True, backwards=True,
                             num_times=args.num_times)
            print(f"{cfg or 'defaults'}: fwd {t_f:.3f} ms   "
                  f"fwd+bwd {t_fb:.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{cfg or 'defaults'}: FAILED {type(e).__name__}: "
                  f"{str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
