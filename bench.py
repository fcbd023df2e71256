"""Driver headline benchmark: ONE JSON line.

Metric: fused Pallas cosine-sim attention fwd+bwd speedup over XLA-naive
(unfused einsum) attention at the north-star config — batch 4, heads 8,
seq 4096, dim_head 64, causal, bf16 (BASELINE.md target: >= 3x).

vs_baseline = speedup / 3.0 (fraction of the 3x target).
"""

import json

import jax
import jax.numpy as jnp
import numpy as np

from flash_cosine_sim_attention_tpu import flash_cosine_sim_attention
from flash_cosine_sim_attention_tpu.utils import benchmark
from flash_cosine_sim_attention_tpu.utils.benchmark import (
    xla_naive_cosine_sim_attention,
)


def main():
    b, h, seq, d = 4, 8, 4096, 64
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, seq, d)), dtype)
               for _ in range(3))

    t_fused = benchmark(
        lambda q, k, v: flash_cosine_sim_attention(q, k, v, causal=True),
        q, k, v, forwards=True, backwards=True, num_times=20)
    t_naive = benchmark(
        lambda q, k, v: xla_naive_cosine_sim_attention(q, k, v, causal=True),
        q, k, v, forwards=True, backwards=True, num_times=20)

    speedup = t_naive / t_fused
    print(json.dumps({
        "metric": "cosine_sim_attn_fwdbwd_speedup_vs_xla_naive_bf16_seq4096",
        "value": round(speedup, 3),
        "unit": "x",
        "vs_baseline": round(speedup / 3.0, 3),
        "detail": {"fused_ms": round(t_fused, 3),
                   "naive_ms": round(t_naive, 3),
                   "device": jax.devices()[0].device_kind},
    }))


if __name__ == "__main__":
    main()
