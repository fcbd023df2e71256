"""Public fused cosine-sim flash attention op.

Mirrors the reference's public API exactly
(reference: flash_cosine_sim_attention/flash_cosine_sim_attention.py:308-334
and the autograd Function at .py:245-304), rebuilt TPU-native:

  * the torch ``autograd.Function`` becomes ``jax.custom_vjp`` wired to the
    Pallas forward/backward kernels, saving ``(o, inv_l, q, k, v, mask,
    bias)`` as residuals exactly like ``ctx.save_for_backward`` (.py:270);
  * the CUDA-vs-CPU device dispatch (.py:323) becomes Pallas
    compiled-vs-interpret dispatch: on TPU the kernels compile via Mosaic,
    anywhere else they run in interpreter mode so the same code path works
    on CPU CI;
  * the dtype/head-dim template dispatch (dispatch.h) collapses into
    Python: kernels are specialized per static config by tracing, cached by
    ``jit`` + an ``lru_cache`` of custom_vjp wrappers.

Shape rules (ref cu:1647-1675): 3-D q means merged batch-heads (forces
``attn_bias_batch_dim=True``); 3-D k/v means single-headed KV (PaLM-style);
mask is (b, j) boolean; bias is (b, i, j) or (h, i, j).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from .blocks import ALLOWED_DIM_HEADS
from .bwd_kernel import flash_attention_backward
from .fwd_kernel import flash_attention_forward
from .reference import (
    canonicalize_qkv,
    l2norm_tensors,
    plain_cosine_sim_attention,
)


def _use_interpret() -> bool:
    """Pallas interpret mode everywhere but real TPUs (CPU CI, dry runs)."""
    return jax.default_backend() != "tpu"


def _plain_max_seq() -> int:
    """Below this sequence length the fused kernels lose to the plain XLA
    einsum path (per-grid-step overhead dominates while the materialized
    logits are tiny); measured on v5e the fused path is 2-7x slower at seq
    128-512 and wins from ~1024 up.  Overridable via FCSA_PLAIN_MAX_SEQ
    (0 disables the fallback entirely)."""
    import os

    return int(os.environ.get("FCSA_PLAIN_MAX_SEQ", "512"))


def _should_use_plain(seq_q: int, seq_k: int, interpret, qk_quant,
                      block_q, block_k) -> bool:
    """Auto-fallback decision (trace-time static, shapes are static under
    jit).  Only fires in the default configuration on a real TPU: any
    explicit interpret / block-size / quantized-QK request pins the
    kernels (that is also the escape hatch for on-TPU kernel tests)."""
    if interpret is not None or qk_quant is not None:
        return False
    if block_q is not None or block_k is not None:
        return False
    if _use_interpret():  # CPU CI exercises the kernels, never falls back
        return False
    limit = _plain_max_seq()
    return max(seq_q, seq_k) <= limit


@functools.lru_cache(maxsize=None)
def _make_fused(scale, causal, bias_batch_dim, block_q, block_k, interpret,
                qk_quant=None):
    """Build the custom-vjp fused op for one static configuration.

    ``qk_quant`` selects a quantized-QK forward:
      * ``"int8"``: normalized Q/K quantized at the fixed scale 127
        (exact range fit for [-1, 1] values) so QK^T runs on the int8
        MXU path (2x bf16 throughput on v5e); the 1/127^2 dequant folds
        into the kernel's compile-time logit scale.
      * ``"fp8"``: Q/K rounded through e4m3.  v5e has no native fp8 MXU,
        so this is an ACCURACY knob (fp8 numerics at bf16 speed), not a
        speedup — useful for validating fp8 deployments of the cache.
    Either way the backward is straight-through: the standard Pallas
    backward runs on the (de)quantized q/k, so the op is usable for
    quantization-aware training as well as inference prefill.
    """

    kw = dict(
        bias_batch_dim=bias_batch_dim,
        scale=scale,
        causal=causal,
        block_q=block_q,
        block_k=block_k,
        interpret=interpret,
    )

    if qk_quant == "int8":
        def _quant(t):
            return jnp.round(
                jnp.clip(t.astype(jnp.float32) * 127.0, -127, 127)
            ).astype(jnp.int8)

        def _fwd(q, k, v, mask, bias):
            return flash_attention_forward(
                _quant(q), _quant(k), v, mask, bias,
                s_dequant=1.0 / (127.0 * 127.0), **kw)
    elif qk_quant == "fp8":
        def _fwd(q, k, v, mask, bias):
            q8 = q.astype(jnp.float8_e4m3fn).astype(q.dtype)
            k8 = k.astype(jnp.float8_e4m3fn).astype(k.dtype)
            return flash_attention_forward(q8, k8, v, mask, bias, **kw)
    else:
        assert qk_quant is None, qk_quant

        def _fwd(q, k, v, mask, bias):
            return flash_attention_forward(q, k, v, mask, bias, **kw)

    @jax.custom_vjp
    def fused(q, k, v, mask, bias):
        o, _ = _fwd(q, k, v, mask, bias)
        return o

    def fused_fwd(q, k, v, mask, bias):
        o, inv_l = _fwd(q, k, v, mask, bias)
        return o, (o, inv_l, q, k, v, mask, bias)

    def fused_bwd(res, do):
        o, inv_l, q, k, v, mask, bias = res
        dq, dk, dv, db = flash_attention_backward(
            do, o, inv_l, q, k, v, mask, bias, **kw
        )
        return dq, dk, dv, None, db

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def flash_cosine_sim_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    attn_bias: Optional[jax.Array] = None,
    scale: float = 8.0,
    groups: int = 1,
    causal: bool = False,
    l2norm_qk: bool = True,
    attn_bias_batch_dim: bool = False,
    *,
    qk_int8: bool = False,
    qk_fp8: bool = False,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Fused cosine-sim flash attention (signature: ref .py:308-318).

    Args:
      q: (b, h, i, d) queries, or (b*h, i, d) merged batch-head.
      k, v: (b, kvh, j, d) with kvh dividing h (kvh=h: MHA; kvh=1 =
        (b, j, d): single-headed/PaLM KV; in between: grouped-query),
        or (b, j, d) for single-headed KV.
      mask: (b, j) boolean key mask (True = attend); exclusive with causal.
      attn_bias: (b, i, j) if ``attn_bias_batch_dim`` else (h, i, j);
        differentiable.
      scale: fixed logit scale applied to the cosine similarity (default 8,
        the reference's default; large-model experiments use 10 with
        groups>1 — reference README.md:200-206).
      groups: grouped-l2norm groups.
      causal: causal masking with cross-attention alignment.
      l2norm_qk: l2-normalize q/k here (set False if normalized outside).
      attn_bias_batch_dim: bias leading dim is batch instead of heads.
      qk_int8: run QK^T on the int8 MXU path (fixed scale 127 on the
        normalized q/k — exact range fit for bounded inputs; ~1e-2 output
        error).  Forward-quantized, straight-through backward (QAT-ready).
      qk_fp8: round Q/K through e4m3 before QK^T — fp8 numerics at bf16
        speed (v5e has no native fp8 MXU); an accuracy-validation knob.
      block_q/block_k: kernel tile-size override (default: tuned table).
      interpret: force Pallas interpret mode (default: auto off-TPU).

    Returns attention output with the same shape/dtype as ``q``.
    """
    assert not (causal and mask is not None), (
        "mask should not be supplied if causality is needed"
    )
    assert not (qk_int8 and qk_fp8)
    qk_quant = "int8" if qk_int8 else ("fp8" if qk_fp8 else None)

    # short sequences: delegate to the plain einsum path (numerically the
    # ground truth, differentiable, every flag supported) — the fused
    # kernels' per-grid-step overhead loses below the crossover (the
    # reference documents the same memory/speed crossover at seq 2048,
    # README.md:19); see _should_use_plain for the exact conditions
    if _should_use_plain(q.shape[-2], k.shape[-2], interpret, qk_quant,
                         block_q, block_k):
        return plain_cosine_sim_attention(
            q, k, v, mask=mask, attn_bias=attn_bias, scale=scale,
            groups=groups, causal=causal, l2norm_qk=l2norm_qk,
            attn_bias_batch_dim=attn_bias_batch_dim)

    # the reference restricts dim_head to {16,32,64,96,128} (cu:1673-1675);
    # the TPU kernels are tuned for those but accept any multiple of 8
    # (Mosaic's lane-tiling requirement) — reject the rest with a clear
    # error instead of a kernel-lowering failure
    d = q.shape[-1]
    assert d in ALLOWED_DIM_HEADS or d % 8 == 0, (
        f"dim_head {d} not supported: must be one of {ALLOWED_DIM_HEADS} "
        f"or a multiple of 8"
    )

    if l2norm_qk:
        q, k = l2norm_tensors(q, k, groups=groups)

    q4, k4, v4, merged, _, bias_batch_dim = canonicalize_qkv(
        q, k, v, attn_bias_batch_dim
    )

    # float16 acceptance (the reference dispatches Half natively,
    # cu:1702/1833; its f16 test tolerance is 1e-1, test.py:12-18): the
    # TPU MXU's native half format is bf16, so f16 inputs compute in bf16
    # and cast back.  The casts sit OUTSIDE the custom_vjp, so autodiff
    # returns f16 gradients automatically.
    in_dtype = q4.dtype
    is_f16 = in_dtype == jnp.float16
    if is_f16:
        q4, k4, v4 = (t.astype(jnp.bfloat16) for t in (q4, k4, v4))
        if attn_bias is not None and attn_bias.dtype == jnp.float16:
            attn_bias = attn_bias.astype(jnp.bfloat16)

    if interpret is None:
        interpret = _use_interpret()

    fused = _make_fused(
        float(scale), bool(causal), bool(bias_batch_dim),
        block_q, block_k, bool(interpret), qk_quant,
    )
    o = fused(q4, k4, v4, mask, attn_bias)
    if is_f16:
        o = o.astype(in_dtype)

    if merged:
        o = o[:, 0]
    return o


def debug():
    """No-op debug hook, kept for API parity (ref cu:1921-1926)."""
    return None
