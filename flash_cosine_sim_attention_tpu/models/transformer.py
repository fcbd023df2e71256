"""GPT-style validation transformer around cosine-sim attention.

TPU-native (flax.linen) rebuild of the reference model
(reference: flash_cosine_sim_attention/transformer.py:30-202):

  * ``Attention``: pre/post-norm, q/k/v/out projections without bias,
    always-causal fused or plain cosine-sim attention, or a vanilla-softmax
    baseline for A/B experiments (transformer.py:59-105, 30-37).
  * ``FeedForward``: Linear-GELU-Linear, 4x mult (transformer.py:50-57).
  * ``CosineSimCausalTransformer``: token+pos embeddings; post-norm default
    with DeepNet-style residual scaling ``(2*depth)**0.25`` and
    xavier-normal init with gain ``(8*depth)**-0.25`` (transformer.py:
    132, 151-165); pre-norm variant; top-k ``generate``; shifted-label
    cross-entropy loss (transformer.py:167-202).

Differences by design: modules are stateless flax defs; generation is a
jitted ``lax.fori_loop`` over a fixed-size token buffer (one compile)
instead of a python loop of growing-shape forwards.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import (
    flash_cosine_sim_attention,
    non_cosine_sim_attention,
    plain_cosine_sim_attention,
)


def xavier_normal(gain: float = 1.0):
    """torch ``xavier_normal_(gain)`` == variance_scaling(gain^2, fan_avg)."""
    return nn.initializers.variance_scaling(
        gain * gain, "fan_avg", "normal"
    )


class Attention(nn.Module):
    """Causal cosine-sim attention block (ref transformer.py:59-105)."""

    dim: int
    dim_head: int = 64
    heads: int = 8
    kv_heads: Optional[int] = None  # < heads -> grouped-query; 1 -> MQA
    scale: float = 8.0
    l2norm_groups: int = 1
    pre_norm: bool = False
    use_fused: bool = True
    non_cosine_sim_attn: bool = False
    init_gain: float = 1.0  # DeepNet gain for to_v / to_out
    dtype: Any = jnp.float32
    mesh: Any = None  # jax.sharding.Mesh -> head-sharded attention

    @nn.compact
    def __call__(self, x):
        h = self.heads
        kvh = self.kv_heads or h
        assert h % kvh == 0, (h, kvh)
        if self.pre_norm:
            x = nn.LayerNorm(dtype=self.dtype)(x)

        dense = partial(nn.Dense, use_bias=False, dtype=self.dtype)
        q = dense(self.dim_head * h, kernel_init=xavier_normal(1.0),
                  name="to_q")(x)
        k = dense(self.dim_head * kvh, kernel_init=xavier_normal(1.0),
                  name="to_k")(x)
        v = dense(self.dim_head * kvh,
                  kernel_init=xavier_normal(self.init_gain), name="to_v")(x)

        def split(t, nh):
            return t.reshape(*t.shape[:-1], nh, self.dim_head)\
                .swapaxes(-2, -3)  # (b, n, nh*d) -> (b, nh, n, d)
        q, k, v = split(q, h), split(k, kvh), split(v, kvh)
        if self.non_cosine_sim_attn:
            assert kvh == h, (
                "grouped-query KV is supported on the fused/plain/mesh "
                "paths; the vanilla-softmax baseline is MHA-only")

        if self.non_cosine_sim_attn:
            o = non_cosine_sim_attention(q, k, v)
        elif self.mesh is not None:
            from ..parallel import head_sharded_flash_attention
            o = head_sharded_flash_attention(
                q, k, v, self.mesh, causal=True, scale=self.scale,
                groups=self.l2norm_groups,
            )
        elif self.use_fused:
            o = flash_cosine_sim_attention(
                q, k, v, causal=True, scale=self.scale,
                groups=self.l2norm_groups,
            )
        else:
            o = plain_cosine_sim_attention(
                q, k, v, causal=True, scale=self.scale,
                groups=self.l2norm_groups,
            )

        o = o.swapaxes(-2, -3).reshape(*x.shape[:-1], h * self.dim_head)
        return nn.Dense(
            self.dim, use_bias=False, dtype=self.dtype,
            kernel_init=xavier_normal(self.init_gain), name="to_out",
        )(o)


class FeedForward(nn.Module):
    """Linear-GELU-Linear, 4x expansion (ref transformer.py:50-57)."""

    dim: int
    mult: int = 4
    pre_norm: bool = False
    init_gain: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.pre_norm:
            x = nn.LayerNorm(dtype=self.dtype)(x)
        x = nn.Dense(
            self.dim * self.mult, use_bias=False, dtype=self.dtype,
            kernel_init=xavier_normal(self.init_gain),
        )(x)
        x = nn.gelu(x)
        return nn.Dense(
            self.dim, use_bias=False, dtype=self.dtype,
            kernel_init=xavier_normal(self.init_gain),
        )(x)


class CosineSimCausalTransformer(nn.Module):
    """Char-level causal LM for validating the attention kernels
    (ref transformer.py:109-202)."""

    num_tokens: int
    dim: int
    max_seq_len: int
    depth: int
    heads: int = 8
    kv_heads: Optional[int] = None  # GQA/MQA; None -> heads (MHA)
    dim_head: int = 64
    attn_scale: float = 8.0
    attn_l2norm_groups: int = 1
    pre_norm: bool = False
    use_fused: bool = True
    non_cosine_sim_attn: bool = False
    dtype: Any = jnp.float32
    mesh: Any = None  # jax.sharding.Mesh -> head-sharded TP attention

    @property
    def residual_scale(self) -> float:
        # DeepNet residual scaling, post-norm only (ref transformer.py:132)
        return 1.0 if self.pre_norm else (2 * self.depth) ** 0.25

    @nn.compact
    def __call__(self, x, return_loss: bool = False):
        if return_loss:
            x, labels = x[:, :-1], x[:, 1:]

        n = x.shape[1]
        # embeddings init'd tiny in post-norm mode (ref transformer.py:152-153)
        emb_init = (nn.initializers.normal(stddev=1e-5) if not self.pre_norm
                    else nn.initializers.normal(stddev=0.02))
        tok = nn.Embed(self.num_tokens, self.dim, dtype=self.dtype,
                       embedding_init=emb_init, name="token_emb")(x)
        pos = nn.Embed(self.max_seq_len, self.dim, dtype=self.dtype,
                       embedding_init=emb_init, name="pos_emb")(
            jnp.arange(n))
        h = tok + pos[None]

        init_gain = (8 * self.depth) ** -0.25 if not self.pre_norm else 1.0
        res_scale = self.residual_scale

        for layer in range(self.depth):
            attn_out = Attention(
                dim=self.dim, dim_head=self.dim_head, heads=self.heads,
                kv_heads=self.kv_heads,
                scale=self.attn_scale, l2norm_groups=self.attn_l2norm_groups,
                pre_norm=self.pre_norm, use_fused=self.use_fused,
                non_cosine_sim_attn=self.non_cosine_sim_attn,
                init_gain=init_gain, dtype=self.dtype, mesh=self.mesh,
                name=f"attn_{layer}",
            )(h)
            h = attn_out + h * res_scale
            if not self.pre_norm:
                h = nn.LayerNorm(dtype=self.dtype, name=f"attn_norm_{layer}")(h)
            ff_out = FeedForward(
                dim=self.dim, pre_norm=self.pre_norm, init_gain=init_gain,
                dtype=self.dtype, name=f"ff_{layer}",
            )(h)
            h = ff_out + h * res_scale
            if not self.pre_norm:
                h = nn.LayerNorm(dtype=self.dtype, name=f"ff_norm_{layer}")(h)

        if self.pre_norm:
            h = nn.LayerNorm(dtype=self.dtype, name="final_norm")(h)
        logits = nn.Dense(
            self.num_tokens, use_bias=False, dtype=self.dtype,
            kernel_init=xavier_normal(1.0), name="to_logits",
        )(h)

        if not return_loss:
            return logits

        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        loss = -jnp.take_along_axis(logp, labels[..., None], axis=-1)
        return loss.mean()


def top_k_filter(logits: jax.Array, thres: float = 0.9) -> jax.Array:
    """Keep the top (1-thres) fraction of logits, -inf the rest
    (ref transformer.py:41-46)."""
    k = max(1, int((1 - thres) * logits.shape[-1]))
    vals, _ = jax.lax.top_k(logits, k)
    kth = vals[..., -1:]
    return jnp.where(logits < kth, -jnp.inf, logits)


def generate(
    model: CosineSimCausalTransformer,
    params,
    rng: jax.Array,
    start_tokens: jax.Array,       # (b, n) int32
    seq_len: int,
    temperature: float = 1.0,
    filter_thres: float = 0.9,
) -> jax.Array:
    """Top-k autoregressive sampling (ref transformer.py:167-181).

    Jit-friendly: a ``fori_loop`` over a fixed-size ring of the last
    ``max_seq_len`` tokens, so generation compiles once regardless of
    prompt/sample lengths.
    """
    b, n = start_tokens.shape
    total = n + seq_len
    window = model.max_seq_len
    buf = jnp.zeros((b, max(total, window)), jnp.int32)
    buf = buf.at[:, :n].set(start_tokens.astype(jnp.int32))

    def step(i, carry):
        buf, rng = carry
        pos = n + i  # index being generated
        start = jnp.maximum(pos - window, 0)
        ctx = jax.lax.dynamic_slice(buf, (0, start), (b, window))
        logits = model.apply(params, ctx)
        # the logit row for the last REAL token in the window
        row = jnp.minimum(pos, window) - 1
        logits = jax.lax.dynamic_slice(
            logits, (0, row, 0), (b, 1, logits.shape[-1]))[:, 0]
        filtered = top_k_filter(logits, filter_thres)
        rng, sub = jax.random.split(rng)
        sample = jax.random.categorical(sub, filtered / temperature, axis=-1)
        buf = jax.lax.dynamic_update_slice(
            buf, sample[:, None].astype(jnp.int32), (0, pos))
        return buf, rng

    buf, _ = jax.lax.fori_loop(0, seq_len, step, (buf, rng))
    return buf[:, n:total]
