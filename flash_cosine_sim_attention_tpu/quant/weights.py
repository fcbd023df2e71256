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

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


def _dequant_matmul_kernel(x_ref, w8_ref, scale_ref, o_ref):
    """One (tokens, block_out) output tile: int8 weight block upcast in
    VMEM (only int8 bytes ever leave HBM), f32 accumulation, per-channel
    scale folded into the tile epilogue."""
    ki = pl.program_id(1)

    @pl.when(ki == 0)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    x = x_ref[...]
    w = w8_ref[...].astype(x.dtype)
    o_ref[...] += jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale_ref[...]


def quantized_matmul(x: jax.Array, w8: jax.Array, scale: jax.Array,
                     block_out: int = 512, block_in: int = 2048,
                     interpret=None) -> jax.Array:
    """``x @ dequant(w8)`` with the dequant fused in a Pallas kernel.

    x: (tokens, in) bf16/f32; w8: (in, out) int8; scale: (1, out) f32.
    Streams int8 weight bytes from HBM (the XLA fallback materializes a
    bf16 copy, forfeiting the bandwidth win — measured ~1.9x slower at
    (8, 4096) x (4096, 16384) on v5e).
    """
    t, d_in = x.shape
    d_out = w8.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    block_out = min(block_out, d_out)
    block_in = min(block_in, d_in)
    assert d_out % block_out == 0 and d_in % block_in == 0

    grid = (d_out // block_out, d_in // block_in)
    out = pl.pallas_call(
        _dequant_matmul_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((t, block_in), lambda oi, ki: (0, ki)),
            pl.BlockSpec((block_in, block_out), lambda oi, ki: (ki, oi)),
            pl.BlockSpec((1, block_out), lambda oi, ki: (0, oi)),
        ],
        out_specs=pl.BlockSpec((t, block_out), lambda oi, ki: (0, oi)),
        out_shape=jax.ShapeDtypeStruct((t, d_out), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, w8, scale)
    return out.astype(x.dtype)


def _kernel_shapes_ok(rows: int, d_in: int, d_out: int) -> bool:
    return (d_out % min(512, d_out) == 0 and d_in % min(2048, d_in) == 0
            and rows >= 1)


def dense_apply(p, x, use_kernel: bool = False):
    """Apply a (possibly quantized) dense kernel dict to ``x``.

    Default XLA path for quantized kernels.  ``use_kernel=True`` routes
    through the Pallas fused-dequant matmul — at int8 HBM speed-of-light
    in ISOLATION, but measured a wash inside a full decode step even at
    0.94B params (112 pallas_calls/step add more launch/fusion-break
    overhead than the ~0.5 ms of weight bandwidth they save, and the
    step is also KV-cache-traffic bound).  Worth enabling only for
    models whose individual weight matrices are much larger.
    """
    if "kernel_q" in p:
        lead = x.shape[:-1]
        rows = 1
        for s in lead:
            rows *= int(s)
        d_in, d_out = p["kernel_q"].shape
        if use_kernel and not _kernel_shapes_ok(rows, d_in, d_out):
            use_kernel = False
        if use_kernel:
            y = quantized_matmul(
                x.reshape(rows, d_in), p["kernel_q"],
                p["kernel_scale"].astype(jnp.float32))
            return y.reshape(*lead, -1)
        y = x @ p["kernel_q"].astype(x.dtype)
        return y * p["kernel_scale"].astype(x.dtype)
    return x @ p["kernel"].astype(x.dtype)
