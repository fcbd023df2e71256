"""MXU tile-matmul helpers shared by the Pallas kernels.

f32 inputs: ``Precision.HIGHEST`` lowers to a 6-pass bf16 decomposition
on the TPU MXU (~7% MFU measured in the r2 backward — the reason the f32
backward LOST to the XLA baseline).  ``dot_f32x3`` instead splits each
operand by hand as ``x = hi + lo`` (bf16 each, together ~16 mantissa
bits) and keeps the three significant cross products — ~1e-5 relative
error, inside the f32 parity budget (1e-4), at half the passes.  Mosaic
rejects the built-in intermediate tiers (``Precision.HIGH`` /
dot-algorithm presets) inside kernels, so the split is done by hand.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def dot_f32x3(a, b, dims):
    """f32 matmul as THREE bf16 MXU passes (hi/lo split, lo*lo dropped)."""
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    mm = functools.partial(jax.lax.dot_general, dimension_numbers=dims,
                          preferred_element_type=jnp.float32)
    return mm(a_hi, b_hi) + (mm(a_hi, b_lo) + mm(a_lo, b_hi))


def make_mm(dtype):
    """Tile-matmul dispatcher: f32 inputs get the 3-pass bf16 split,
    bf16/f16 the native single-pass MXU path."""
    if dtype == jnp.float32:
        return dot_f32x3
    return lambda a, b, dims: jax.lax.dot_general(
        a, b, dims, preferred_element_type=jnp.float32)
