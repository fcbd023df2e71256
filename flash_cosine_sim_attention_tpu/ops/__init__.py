from .flash_attention import debug, flash_cosine_sim_attention
from .reference import (
    grouped_l2norm,
    l2norm,
    l2norm_tensors,
    non_cosine_sim_attention,
    plain_cosine_sim_attention,
    streaming_cosine_sim_attention,
)

__all__ = [
    "debug",
    "flash_cosine_sim_attention",
    "grouped_l2norm",
    "l2norm",
    "l2norm_tensors",
    "non_cosine_sim_attention",
    "plain_cosine_sim_attention",
    "streaming_cosine_sim_attention",
]
