"""Pure-JAX reference layer: the numerical oracle for every fused path.

Behavioral parity with the reference implementation's Python layer
(reference: flash_cosine_sim_attention/flash_cosine_sim_attention.py:38-241):

  * ``l2norm`` / ``grouped_l2norm`` / ``l2norm_tensors`` — cosine-sim
    normalization with dtype-dependent eps (ref .py:38-65).
  * ``plain_cosine_sim_attention`` — the unfused einsum reference with every
    feature flag: key mask, attention bias (batch- or head-dim), causal with
    cross-attention seq-length alignment, single-headed KV, merged
    batch-head queries, grouped l2norm, external-norm (``l2norm_qk=False``),
    fixed scale (ref .py:75-126).
  * ``streaming_cosine_sim_attention`` — a blockwise ``lax.scan`` equivalent
    of the reference's tiled CPU inference path (ref .py:130-241): streams
    column tiles, accumulates un-normalized O and the row-sum L, and divides
    at the end.  This is the *algorithm* the Pallas kernels implement, in
    plain XLA — a second oracle, and the fallback on platforms without
    Pallas support.

Everything here is jittable, differentiable (via plain autodiff), and runs
on any backend.  The fused Pallas kernels are tested against these
functions across the full feature grid.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# l2 normalization (ref .py:38-65)
# ---------------------------------------------------------------------------


def _norm_eps(dtype) -> float:
    """Dtype-dependent norm clamp (ref .py:39: 1e-12 f32 / 1e-3 half)."""
    if dtype in (jnp.float16, jnp.bfloat16):
        return 1e-3
    return 1e-12


def l2norm(t: jax.Array, eps: Optional[float] = None) -> jax.Array:
    """L2-normalize the last dimension with a clamped norm."""
    eps = _norm_eps(t.dtype) if eps is None else eps
    # compute the norm in f32 for stability at low precision
    norm = jnp.linalg.norm(t.astype(jnp.float32), axis=-1, keepdims=True)
    out = t.astype(jnp.float32) / jnp.maximum(norm, eps)
    return out.astype(t.dtype)


def grouped_l2norm(t: jax.Array, groups: int = 1) -> jax.Array:
    """L2-normalize ``groups`` sub-vectors of the last dim (ref .py:50-55).

    The "grouped l2norm" expressivity knob: splitting the head dim into
    groups before normalizing recovers quality lost to full-vector
    normalization (reference README.md:11-15).
    """
    if groups == 1:
        return l2norm(t)
    shape = t.shape
    dim = shape[-1]
    assert dim % groups == 0, f"head dim {dim} not divisible by groups {groups}"
    t = t.reshape(*shape[:-1], groups, dim // groups)
    t = l2norm(t)
    return t.reshape(shape)


def l2norm_tensors(*tensors: jax.Array, groups: int = 1):
    """Grouped-l2norm each tensor, restoring the input dtype (ref .py:57-65)."""
    assert len(tensors) > 0
    dtype = tensors[0].dtype
    out = tuple(grouped_l2norm(t, groups=groups).astype(dtype) for t in tensors)
    return out if len(out) > 1 else out[0]


# ---------------------------------------------------------------------------
# shape canonicalization shared by every path (ref cu:1647-1675)
# ---------------------------------------------------------------------------


def canonicalize_qkv(q, k, v, attn_bias_batch_dim):
    """Apply the reference's shape rules; return 4-D views + restore info.

    * 3-D q => merged batch-head: treated as (b*h, 1, n, d) with
      ``attn_bias_batch_dim`` forced True (ref cu:1647-1654).
    * 3-D k/v => single-headed KV: (b, 1, j, d) (ref cu:1656-1660).
    """
    merged_batch_heads = q.ndim == 3
    if merged_batch_heads:
        assert k.ndim == 3 and v.ndim == 3, (
            "if batch and heads are merged for queries, keys and values must "
            "also have only 3 dimensions"
        )
        attn_bias_batch_dim = True
        q = q[:, None, :, :]
    single_head_kv = k.ndim == 3
    if single_head_kv:
        k = k[:, None, :, :]
        v = v[:, None, :, :]
    assert q.shape[-1] == k.shape[-1] == v.shape[-1], "q, k, v head dims must match"
    assert k.shape[-2] == v.shape[-2], "k and v sequence lengths must match"
    return q, k, v, merged_batch_heads, single_head_kv, attn_bias_batch_dim


def _bias_to_4d(attn_bias, attn_bias_batch_dim):
    """(b|h, i, j) bias -> broadcastable (b, h, i, j) view (ref .py:106-108)."""
    if attn_bias is None:
        return None
    return attn_bias[:, None] if attn_bias_batch_dim else attn_bias[None, :]


# ---------------------------------------------------------------------------
# plain (unfused) cosine-sim attention — the oracle (ref .py:75-126)
# ---------------------------------------------------------------------------


def plain_cosine_sim_attention(
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
) -> jax.Array:
    """Unfused einsum cosine-sim attention; numerically the ground truth.

    Args mirror the reference signature exactly (ref .py:75-87).
      q: (b, h, i, d) or (b*h, i, d) merged batch-head.
      k, v: (b, h, j, d) or (b, j, d) single-headed KV.
      mask: (b, j) bool key mask, True = attend.
      attn_bias: (b, i, j) if attn_bias_batch_dim else (h, i, j).
    """
    assert not (causal and mask is not None), (
        "mask should not be supplied if causality is needed"
    )
    q, k, v, merged, _, attn_bias_batch_dim = canonicalize_qkv(
        q, k, v, attn_bias_batch_dim
    )

    if l2norm_qk:
        q, k = l2norm_tensors(q, k, groups=groups)

    dtype = q.dtype
    # grouped-query: repeat each KV head over its query-head group (the
    # fused kernels index instead of repeating; exactness is identical)
    kvh = k.shape[1]
    h = q.shape[1]
    if 1 < kvh < h:
        k = jnp.repeat(k, h // kvh, axis=1)
        v = jnp.repeat(v, h // kvh, axis=1)
    # (b, h, i, d) @ (b, {h|1}, d, j) -> (b, h, i, j); kv-head dim broadcasts
    sim = jnp.matmul(
        q.astype(jnp.float32), k.astype(jnp.float32).swapaxes(-1, -2),
        precision=jax.lax.Precision.HIGHEST,
    )
    sim = sim * scale

    bias = _bias_to_4d(attn_bias, attn_bias_batch_dim)
    if bias is not None:
        sim = sim + bias.astype(jnp.float32)

    mask_value = -jnp.finfo(jnp.float32).max

    if causal:
        i, j = sim.shape[-2:]
        # cross-attention causal alignment: query row r attends to cols
        # <= r + (j - i)   (ref .py:114: triu(j - i + 1))
        row = jax.lax.broadcasted_iota(jnp.int32, (i, j), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (i, j), 1)
        causal_mask = col > (row + (j - i))
        sim = jnp.where(causal_mask, mask_value, sim)

    if mask is not None:
        sim = jnp.where(mask[:, None, None, :], sim, mask_value)

    attn = jax.nn.softmax(sim, axis=-1)
    out = jnp.matmul(attn, v.astype(jnp.float32), precision=jax.lax.Precision.HIGHEST)
    out = out.astype(dtype)

    if merged:
        out = out[:, 0]
    return out


# ---------------------------------------------------------------------------
# blockwise streaming path — lax.scan over column tiles (ref .py:130-241)
# ---------------------------------------------------------------------------


def streaming_cosine_sim_attention(
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
    col_tile_size: int = 512,
) -> jax.Array:
    """O(n)-memory streaming attention in plain XLA (`lax.scan` over K/V tiles).

    Same math as the fused kernel: because logits are bounded by ``scale``
    (cosine sim in [-1, 1]), each tile computes ``exp(scale*sim - scale +
    bias)`` directly — no running row max — and partial results merge by
    plain summation of exp-weights and row-sums (ref .py:218-240).
    """
    assert not (causal and mask is not None)
    q, k, v, merged, _, attn_bias_batch_dim = canonicalize_qkv(
        q, k, v, attn_bias_batch_dim
    )
    if l2norm_qk:
        q, k = l2norm_tensors(q, k, groups=groups)

    dtype = q.dtype
    b, h, i_len, d = q.shape
    kvh = k.shape[1]
    if 1 < kvh < h:  # grouped-query: repeat KV heads over the group
        k = jnp.repeat(k, h // kvh, axis=1)
        v = jnp.repeat(v, h // kvh, axis=1)
        kvh = h
    j_len = k.shape[-2]
    seq_len_diff = j_len - i_len

    n_tiles = math.ceil(j_len / col_tile_size)
    pad_j = n_tiles * col_tile_size - j_len

    qf = q.astype(jnp.float32)
    kf = jnp.pad(k.astype(jnp.float32), ((0, 0), (0, 0), (0, pad_j), (0, 0)))
    vf = jnp.pad(v.astype(jnp.float32), ((0, 0), (0, 0), (0, pad_j), (0, 0)))
    keep = jnp.arange(n_tiles * col_tile_size) < j_len  # (J,)
    if mask is not None:
        keep = keep[None, :] & jnp.pad(mask, ((0, 0), (0, pad_j)))  # (b, J)
    else:
        keep = jnp.broadcast_to(keep[None, :], (b, n_tiles * col_tile_size))

    bias = _bias_to_4d(attn_bias, attn_bias_batch_dim)
    if bias is not None:
        bias = jnp.broadcast_to(
            bias.astype(jnp.float32), (b, h, i_len, j_len)
        )
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, 0), (0, pad_j)))

    # scan over column tiles; carry un-normalized O and rowsum L
    kf_t = kf.reshape(b, kvh, n_tiles, col_tile_size, d).transpose(2, 0, 1, 3, 4)
    vf_t = vf.reshape(b, kvh, n_tiles, col_tile_size, d).transpose(2, 0, 1, 3, 4)
    keep_t = keep.reshape(b, n_tiles, col_tile_size).transpose(1, 0, 2)
    if bias is not None:
        bias_t = bias.reshape(b, h, i_len, n_tiles, col_tile_size)
        bias_t = bias_t.transpose(3, 0, 1, 2, 4)

    row_idx = jnp.arange(i_len)

    def body(carry, xs):
        o_acc, l_acc = carry
        if bias is not None:
            kc, vc, keepc, bc, tile_idx = xs
        else:
            kc, vc, keepc, tile_idx = xs
            bc = None
        w = jnp.matmul(qf, kc.swapaxes(-1, -2), precision=jax.lax.Precision.HIGHEST) * scale
        if bc is not None:
            w = w + bc
        w = jnp.exp(w - scale)
        keep_tile = keepc[:, None, None, :]  # (b,1,1,tile)
        if causal:
            col_idx = tile_idx * col_tile_size + jnp.arange(col_tile_size)
            causal_keep = col_idx[None, :] <= (row_idx[:, None] + seq_len_diff)
            keep_tile = keep_tile & causal_keep[None, None, :, :]
        w = jnp.where(keep_tile, w, 0.0)
        o_acc = o_acc + jnp.matmul(w, vc, precision=jax.lax.Precision.HIGHEST)
        l_acc = l_acc + jnp.sum(w, axis=-1, keepdims=True)
        return (o_acc, l_acc), None

    o0 = jnp.zeros((b, h, i_len, d), jnp.float32)
    l0 = jnp.zeros((b, h, i_len, 1), jnp.float32)
    tile_ids = jnp.arange(n_tiles)
    xs = (kf_t, vf_t, keep_t, bias_t, tile_ids) if bias is not None else (
        kf_t, vf_t, keep_t, tile_ids
    )
    (o, l), _ = jax.lax.scan(body, (o0, l0), xs)

    out = (o / jnp.maximum(l, 1e-12)).astype(dtype)
    if merged:
        out = out[:, 0]
    return out


# vanilla softmax attention baseline for A/B experiments
# (ref transformer.py:30-37)
def non_cosine_sim_attention(q, k, v, **kwargs):
    q = q * (q.shape[-1] ** -0.5)
    sim = jnp.einsum("bhid,bhjd->bhij", q, k)
    i, j = sim.shape[-2:]
    row = jax.lax.broadcasted_iota(jnp.int32, (i, j), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (i, j), 1)
    sim = jnp.where(col > row + (j - i), -jnp.finfo(sim.dtype).max, sim)
    attn = jax.nn.softmax(sim, axis=-1)
    return jnp.einsum("bhij,bhjd->bhid", attn, v)
