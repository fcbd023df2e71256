from .decode_kernel import (
    quantized_decode_attention,
    reference_decode_attention,
)
from .kv_cache import (
    FP8_DTYPE,
    K_SCALE,
    QuantKVCache,
    append,
    dequantize_k,
    dequantize_v,
    init_cache,
    quantize_k,
    quantize_v,
)
from .paged import (
    PageAllocator,
    PagedKVCache,
    append_paged,
    init_paged_cache,
    paged_decode_attention,
)
from .weights import (
    dense_apply,
    dequantize_dense_kernel,
    quantize_dense_kernel,
    quantize_params,
    quantized_matmul,
)

__all__ = [
    "FP8_DTYPE",
    "K_SCALE",
    "PageAllocator",
    "PagedKVCache",
    "append_paged",
    "dense_apply",
    "dequantize_dense_kernel",
    "init_paged_cache",
    "paged_decode_attention",
    "quantize_dense_kernel",
    "quantize_params",
    "quantized_matmul",
    "QuantKVCache",
    "append",
    "dequantize_k",
    "dequantize_v",
    "init_cache",
    "quantize_k",
    "quantize_v",
    "quantized_decode_attention",
    "reference_decode_attention",
]
