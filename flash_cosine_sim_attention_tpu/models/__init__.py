from .decoding import fuse_qkv_params
from .speculative import (
    make_batched_speculative_decoder,
    make_speculative_decoder,
    speculative_generate,
)
from .transformer import (
    Attention,
    CosineSimCausalTransformer,
    FeedForward,
    generate,
    top_k_filter,
)

__all__ = [
    "Attention",
    "CosineSimCausalTransformer",
    "FeedForward",
    "fuse_qkv_params",
    "generate",
    "make_batched_speculative_decoder",
    "make_speculative_decoder",
    "speculative_generate",
    "top_k_filter",
]
