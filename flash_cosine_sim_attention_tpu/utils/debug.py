"""Debug / numeric-checking helpers.

The reference's error story is ``CHECK_LAST_CUDA_ERROR`` (a forced sync +
error print, cu:16-28) plus a no-op ``debug()`` binding (cu:1921-1926).
XLA already raises on launch failures; the TPU-native equivalents here
add what a kernel developer actually wants:

  * ``checkify_attention`` — a checkify-wrapped fused attention that
    turns NaN/Inf anywhere in the output into a checked, locatable error
    instead of silent propagation;
  * ``debug_attention`` — runs the fused kernel AND the einsum oracle on
    the same inputs and reports the numeric gap (the differential test,
    packaged for interactive use).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import checkify

from ..ops import flash_cosine_sim_attention, plain_cosine_sim_attention


def checkify_attention(**attn_kwargs):
    """Build a checked fused-attention callable.

    >>> checked = checkify_attention(causal=True)
    >>> err, out = checked(q, k, v)
    >>> err.throw()   # raises with location if the output had NaN/Inf
    """

    def fn(q, k, v, mask=None, attn_bias=None):
        out = flash_cosine_sim_attention(
            q, k, v, mask=mask, attn_bias=attn_bias, **attn_kwargs)
        checkify.check(
            jnp.isfinite(out.astype(jnp.float32)).all(),
            "flash_cosine_sim_attention produced non-finite values",
        )
        return out

    return checkify.checkify(fn, errors=checkify.user_checks)


def debug_attention(q, k, v, mask=None, attn_bias=None, **kw
                    ) -> Dict[str, Any]:
    """Fused vs oracle on the same inputs; returns a numeric report."""
    fused = flash_cosine_sim_attention(
        q, k, v, mask=mask, attn_bias=attn_bias, **kw)
    oracle = plain_cosine_sim_attention(
        q, k, v, mask=mask, attn_bias=attn_bias, **kw)
    diff = jnp.abs(fused.astype(jnp.float32) - oracle.astype(jnp.float32))
    return {
        "max_abs_diff": float(diff.max()),
        "mean_abs_diff": float(diff.mean()),
        "fused_finite": bool(jnp.isfinite(
            fused.astype(jnp.float32)).all()),
        "oracle_finite": bool(jnp.isfinite(
            oracle.astype(jnp.float32)).all()),
        "shape": tuple(fused.shape),
        "dtype": str(fused.dtype),
        "backend": jax.default_backend(),
    }
