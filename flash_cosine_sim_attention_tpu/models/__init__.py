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
    "generate",
    "top_k_filter",
]
