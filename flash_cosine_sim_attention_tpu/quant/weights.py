"""INT8 weight quantization for the serving path.

Completes the quantized-inference story (north star): with the KV cache
already int8, the model weights are the other large HBM resident.
Per-output-channel absmax int8 halves weight MEMORY vs bf16 (4x vs
f32).  Measured caveat (v5e, dim 512 / depth 8): decode-step time is
speed-NEUTRAL (0.95x) — XLA does not reliably fuse the int8->bf16
upcast into the dot's operand read, so the win is capacity (bigger
models per chip), not bandwidth.  A Pallas fused-dequant matmul is the
known fix if weight bandwidth ever dominates.

Applies to the decode/prefill path in ``models/decoding.py``, which
applies parameters manually (``_dense``) rather than through flax
modules: ``quantize_params`` rewrites every 2-D ``kernel`` into
``{"kernel_q": int8, "kernel_scale": f32(1, out)}``, and ``_dense``
recognizes the quantized form.  Embeddings, norms and biases stay in
full precision (they are small and precision-critical).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def quantize_dense_kernel(w: jax.Array):
    """(in, out) kernel -> (int8 kernel, (1, out) f32 scale)."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    w8 = jnp.round(
        jnp.clip(w.astype(jnp.float32) / scale, -127, 127)).astype(jnp.int8)
    return w8, scale


def dequantize_dense_kernel(w8: jax.Array, scale: jax.Array,
                            dtype=jnp.float32) -> jax.Array:
    return (w8.astype(jnp.float32) * scale).astype(dtype)


def quantize_params(params: Any) -> Any:
    """Rewrite every 2-D ``kernel`` leaf dict into the quantized form.

    Returns a new params pytree usable by models/decoding.py's manual
    apply path (prefill / decode_step / the serving engines).
    """

    def walk(node):
        if isinstance(node, dict):
            if "kernel" in node and getattr(node["kernel"], "ndim", 0) == 2:
                w8, scale = quantize_dense_kernel(node["kernel"])
                new = {k: walk(v) for k, v in node.items() if k != "kernel"}
                new["kernel_q"] = w8
                new["kernel_scale"] = scale
                return new
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(jax.tree.map(lambda x: x, params))  # shallow copy leaves


def dense_apply(p, x):
    """Apply a (possibly quantized) dense kernel dict to ``x``.

    int8 path: the matmul runs with the int8 kernel upcast to the
    activation dtype (XLA fuses the convert into the fused matmul loop,
    so only int8 bytes stream from HBM) and the per-channel scale
    multiplies the (much smaller) output.
    """
    if "kernel_q" in p:
        y = x @ p["kernel_q"].astype(x.dtype)
        return y * p["kernel_scale"].astype(x.dtype)
    return x @ p["kernel"].astype(x.dtype)
