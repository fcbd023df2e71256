"""TPU-native cosine-sim flash attention framework (JAX / Pallas / pjit).

A from-scratch rebuild of the capabilities of
lucidrains/flash-cosine-sim-attention for TPUs: fused no-row-max flash
attention kernels in Pallas, a pure-JAX oracle, a GPT-style validation
transformer, training/benchmark drivers, low-precision (bf16/int8/fp8)
paths, and multi-host sharding.

Public exports mirror the reference (__init__.py:1:
``flash_cosine_sim_attention, plain_cosine_sim_attention, l2norm_tensors,
debug``).
"""

from .ops import (
    debug,
    flash_cosine_sim_attention,
    grouped_l2norm,
    l2norm,
    l2norm_tensors,
    non_cosine_sim_attention,
    plain_cosine_sim_attention,
    streaming_cosine_sim_attention,
)
from .version import __version__

__all__ = [
    "__version__",
    "debug",
    "flash_cosine_sim_attention",
    "grouped_l2norm",
    "l2norm",
    "l2norm_tensors",
    "non_cosine_sim_attention",
    "plain_cosine_sim_attention",
    "streaming_cosine_sim_attention",
]
