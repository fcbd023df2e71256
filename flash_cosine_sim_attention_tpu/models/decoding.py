"""Cached autoregressive decoding: prefill + INT8-KV decode steps.

The serving path the reference never had (its ``generate`` re-runs the full
forward per token, transformer.py:167-181; so does ours in
``models.transformer.generate`` for parity).  Here instead:

  * ``prefill``  — one fused-attention pass over the prompt that also
    fills per-layer quantized KV caches (O(n^2) once).
  * ``decode_step`` — one token per call: each layer attends its new query
    against its INT8 cache via the fused-dequant Pallas decode kernel
    (O(n) per token, half the HBM traffic of a bf16 cache).

State is a plain pytree (per-layer ``QuantKVCache`` + position), so the
whole decode loop jits and scans.
"""

from __future__ import annotations

from typing import Any, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.reference import l2norm_tensors
from ..quant import QuantKVCache, append, init_cache
from ..quant.decode_kernel import quantized_decode_attention
from ..quant.paged import PagedKVCache, append_paged, paged_decode_attention
from .transformer import CosineSimCausalTransformer, top_k_filter


class DecodeState(NamedTuple):
    caches: Tuple[QuantKVCache, ...]   # one per layer
    pos: jax.Array                     # (b,) int32 — tokens consumed per slot


class PagedDecodeState(NamedTuple):
    caches: Tuple[PagedKVCache, ...]   # one per layer (shared page pools)
    pos: jax.Array                     # (num_slots,) int32


def _layer_params(params, name):
    return {"params": params["params"][name]}


def _dense(p, x):
    from ..quant.weights import dense_apply

    return dense_apply(p, x)


def _layernorm(p, x, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    return y * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)


def fuse_qkv_params(params):
    """Concatenate each attention layer's to_q/to_k/to_v kernels into one
    ``to_qkv`` kernel (column-wise), so the M=1 decode regime issues ONE
    weight-streaming matmul per layer instead of three.

    The decode step is weight-bandwidth-bound at small batch; fusing
    removes two kernel launches / fusion breaks per layer at identical
    math (each output column's dot product is independent, so results
    are bitwise-equal to the separate matmuls).  Works on plain and
    int8-quantized (``quantize_params``) trees; apply AFTER quantizing.
    The head split order is [q | k | v], matching ``_attention_qkv``.
    """

    def fuse(parts, key, axis=1):
        return jnp.concatenate([p[key] for p in parts], axis=axis)

    root = dict(params["params"])
    for name in list(root):
        if not name.startswith("attn_"):
            continue
        lp = dict(root[name])
        if not all(k in lp for k in ("to_q", "to_k", "to_v")):
            continue
        parts = [lp.pop("to_q"), lp.pop("to_k"), lp.pop("to_v")]
        if "kernel_q" in parts[0]:
            lp["to_qkv"] = {
                "kernel_q": fuse(parts, "kernel_q"),
                "kernel_scale": fuse(parts, "kernel_scale"),
            }
        else:
            lp["to_qkv"] = {"kernel": fuse(parts, "kernel")}
        root[name] = lp
    out = dict(params)
    out["params"] = root
    return out


def init_decode_state(model: CosineSimCausalTransformer, batch: int,
                      capacity: int, kv_dtype=jnp.int8) -> DecodeState:
    kvh = model.kv_heads or model.heads
    caches = tuple(
        init_cache(batch, kvh, capacity, model.dim_head,
                   kv_dtype=kv_dtype)
        for _ in range(model.depth))
    return DecodeState(caches, jnp.zeros((batch,), jnp.int32))


def _attention_qkv(model, layer_p, x, groups):
    """q/k/v projections + head split + l2norm, mirroring Attention."""
    h, dh = model.heads, model.dim_head
    kvh = model.kv_heads or h
    if model.pre_norm:
        x = _layernorm(layer_p["LayerNorm_0"], x)

    def split(t, nh):
        return t.reshape(*t.shape[:-1], nh, dh).swapaxes(-2, -3)
    if "to_qkv" in layer_p:
        qkv = _dense(layer_p["to_qkv"], x)
        q, k, v = jnp.split(qkv, [h * dh, (h + kvh) * dh], axis=-1)
    else:
        q = _dense(layer_p["to_q"], x)
        k = _dense(layer_p["to_k"], x)
        v = _dense(layer_p["to_v"], x)
    q, k, v = split(q, h), split(k, kvh), split(v, kvh)
    q, k = l2norm_tensors(q, k, groups=groups)
    return q, k, v


def _ff(model, layer_p, x):
    if model.pre_norm:
        x = _layernorm(layer_p["LayerNorm_0"], x)
    x = _dense(layer_p["Dense_0"], x)
    x = jax.nn.gelu(x)
    return _dense(layer_p["Dense_1"], x)


def _embed(model, params, tokens, pos0):
    """pos0: (b,) per-slot positions; slots may be at different depths."""
    p = params["params"]
    tok = p["token_emb"]["embedding"].astype(model.dtype)[tokens]
    n = tokens.shape[1]
    pos_ids = pos0[:, None] + jnp.arange(n)[None, :]        # (b, n)
    pos = p["pos_emb"]["embedding"].astype(model.dtype)[pos_ids]
    return tok + pos


def _logits(model, params, h):
    p = params["params"]
    if model.pre_norm:
        h = _layernorm(p["final_norm"], h)
    return _dense(p["to_logits"], h)


def _transformer_pass(model, params, x, attn_fn):
    """Shared trunk: embeddings done by caller; ``attn_fn(layer, q, k, v)``
    supplies the attention output per layer."""
    p = params["params"]
    res_scale = model.residual_scale
    h = x
    groups = model.attn_l2norm_groups
    for layer in range(model.depth):
        lp_attn = p[f"attn_{layer}"]
        q, k, v = _attention_qkv(model, lp_attn, h, groups)
        o = attn_fn(layer, q, k, v)
        o = o.astype(h.dtype).swapaxes(-2, -3)
        o = o.reshape(*h.shape[:-1], model.heads * model.dim_head)
        o = _dense(lp_attn["to_out"], o)
        h = o + h * res_scale
        if not model.pre_norm:
            h = _layernorm(p[f"attn_norm_{layer}"], h)
        f = _ff(model, p[f"ff_{layer}"], h)
        h = f + h * res_scale
        if not model.pre_norm:
            h = _layernorm(p[f"ff_norm_{layer}"], h)
    return _logits(model, params, h)


def prefill(model: CosineSimCausalTransformer, params, state: DecodeState,
            tokens: jax.Array, true_len: Optional[jax.Array] = None,
            mesh=None) -> Tuple[jax.Array, DecodeState]:
    """Run the prompt through full fused attention, filling the caches.

    Returns (logits for the last REAL prompt token, new state).
    ``true_len`` (per-slot, optional) supports right-padded length-bucketed
    prompts: causal attention never attends positions to the right, so the
    logits/caches for rows < true_len are exact; the caller masks the rest
    via the cache length.  Currently supports prefill from an empty cache.
    ``mesh`` routes attention through the head-sharded path (serving TP).
    """
    from ..ops import flash_cosine_sim_attention

    caches = list(state.caches)

    def attn(layer, q, k, v):
        caches[layer] = append(caches[layer], k, v)
        if mesh is not None:
            from ..parallel import head_sharded_flash_attention
            return head_sharded_flash_attention(
                q, k, v, mesh, causal=True, scale=model.attn_scale,
                l2norm_qk=False)
        return flash_cosine_sim_attention(
            q, k, v, causal=True, scale=model.attn_scale,
            l2norm_qk=False)

    x = _embed(model, params, tokens, state.pos)
    logits = _transformer_pass(model, params, x, attn)
    if true_len is None:
        last = logits[:, -1]
        new_pos = state.pos + tokens.shape[1]
    else:
        idx = (true_len - 1)[:, None, None]
        last = jnp.take_along_axis(logits, idx, axis=1)[:, 0]
        new_pos = state.pos + true_len
        # truncate lengths to the TRUE prompt lengths so right-pads are
        # never attended by later decode steps (the pad K/V rows are
        # overwritten by the next real append)
        caches = [c._replace(length=new_pos) for c in caches]
    new_state = DecodeState(tuple(caches), new_pos)
    return last, new_state


def decode_step(model: CosineSimCausalTransformer, params,
                state: DecodeState, token: jax.Array, mesh=None,
                active: Optional[jax.Array] = None
                ) -> Tuple[jax.Array, DecodeState]:
    """One decode step: (b,) tokens in, (b, vocab) logits out.
    ``mesh`` routes attention through the head-sharded path (serving TP:
    the KV cache shards batch->data, kv-heads->model).  ``active``
    ((b,) bool, optional) freezes inactive slots' caches and positions —
    continuous batching with slots mid-prefill riding along."""
    caches = list(state.caches)

    def attn(layer, q, k, v):
        caches[layer] = append(caches[layer], k, v, active=active)
        if mesh is not None:
            from ..parallel import head_sharded_decode_attention
            o = head_sharded_decode_attention(
                q[:, :, 0], caches[layer], mesh, scale=model.attn_scale,
                l2norm_qk=False)
            return o[:, :, None, :]
        o = quantized_decode_attention(
            q, caches[layer], scale=model.attn_scale, l2norm_qk=False)
        return o

    x = _embed(model, params, token[:, None], state.pos)
    logits = _transformer_pass(model, params, x, attn)
    new_pos = state.pos + (1 if active is None
                           else active.astype(jnp.int32))
    return logits[:, 0], DecodeState(tuple(caches), new_pos)


def prefill_continue(model: CosineSimCausalTransformer, params,
                     state: DecodeState, slot, tokens: jax.Array,
                     true_len=None) -> Tuple[jax.Array, DecodeState]:
    """Continuation prefill (multi-turn): run a NEW chunk of tokens for a
    slot that already has cached history, processing the whole chunk in
    one pass instead of token-by-token decode.

    No-row-max merging at work: the chunk attends (a) the quantized
    history with a key mask, non-causal, and (b) itself, causal — and the
    two partial attentions merge by summing exp-weights and row-sums
    (exactly the ring-attention merge).  Inference-only (no VJP).

    ``tokens``: (1, t) — optionally right-padded with ``true_len``.
    Returns (last real token's logits (1, vocab), new state).
    """
    from ..ops.fwd_kernel import flash_attention_forward
    from ..quant import dequantize_k, dequantize_v

    caches = list(state.caches)
    pos0 = jax.lax.dynamic_slice_in_dim(state.pos, slot, 1, axis=0)  # (1,)
    n_new = (jnp.full((1,), tokens.shape[1], jnp.int32)
             if true_len is None else true_len)

    def attn(layer, q, k, v):
        c = caches[layer]
        view = QuantKVCache(
            *(jax.lax.dynamic_slice_in_dim(a, slot, 1, axis=0)
              for a in (c.k8, c.v8, c.v_scale, c.length)))
        hist_len = view.length                                  # (1,)
        # (b) chunk vs itself: standard causal
        o_new, inv_new = flash_attention_forward(
            q, k, v, None, None, bias_batch_dim=False,
            scale=model.attn_scale, causal=True,
            interpret=jax.default_backend() != "tpu")
        # (a) chunk vs quantized history: key-masked, non-causal
        k_hist = dequantize_k(view.k8, q.dtype)                 # (1,kvh,cap,d)
        v_hist = dequantize_v(view.v8, view.v_scale, q.dtype)
        keep = (jnp.arange(view.k8.shape[2])[None, :]
                < hist_len[:, None])                            # (1, cap)
        o_hist, inv_hist = flash_attention_forward(
            q, k_hist, v_hist, keep, None, bias_batch_dim=False,
            scale=model.attn_scale, causal=False,
            interpret=jax.default_backend() != "tpu")
        # merge partials: plain sums (no-row-max)
        l_new = 1.0 / inv_new
        l_hist = 1.0 / inv_hist
        l_tot = jnp.maximum(l_new + l_hist, 1e-10)
        o = (o_new.astype(jnp.float32) * l_new
             + o_hist.astype(jnp.float32) * l_hist) / l_tot
        # append the chunk to the slot's cache; right-pads are written
        # but excluded by the corrected length (next append overwrites)
        view = append(view, k, v)
        view = view._replace(length=hist_len + n_new)
        caches[layer] = QuantKVCache(
            *(jax.lax.dynamic_update_slice_in_dim(full, part, slot, axis=0)
              for full, part in zip(c, view)))
        return o.astype(q.dtype)

    x = _embed(model, params, tokens, pos0)
    logits = _transformer_pass(model, params, x, attn)
    if true_len is None:
        last = logits[:, -1]
    else:
        idx = (true_len - 1)[:, None, None]
        last = jnp.take_along_axis(logits, idx, axis=1)[:, 0]
    pos = jax.lax.dynamic_update_slice_in_dim(
        state.pos, pos0 + n_new, slot, axis=0)
    return last, DecodeState(tuple(caches), pos)


# ---------------------------------------------------------------------------
# paged variants: per-layer page POOLS shared by all slots (quant/paged.py)
# ---------------------------------------------------------------------------


def init_paged_decode_state(
    model: CosineSimCausalTransformer,
    num_slots: int,
    num_pages: int,
    page_size: int,
    max_pages_per_slot: int,
    kv_dtype=jnp.int8,
) -> PagedDecodeState:
    from ..quant.paged import init_paged_cache

    caches = tuple(
        init_paged_cache(num_pages, model.kv_heads or model.heads,
                         page_size, model.dim_head,
                         num_slots, max_pages_per_slot, kv_dtype=kv_dtype)
        for _ in range(model.depth))
    return PagedDecodeState(caches, jnp.zeros((num_slots,), jnp.int32))


def _slot_view(cache: PagedKVCache, slot) -> PagedKVCache:
    """b=1 view of one slot over the SHARED pool (pools are aliased)."""
    return cache._replace(
        page_table=jax.lax.dynamic_slice_in_dim(
            cache.page_table, slot, 1, axis=0),
        length=jax.lax.dynamic_slice_in_dim(cache.length, slot, 1, axis=0),
    )


def _merge_view(cache: PagedKVCache, view: PagedKVCache, slot
                ) -> PagedKVCache:
    return PagedKVCache(
        view.k8, view.v8, view.v_scale, cache.page_table,
        jax.lax.dynamic_update_slice_in_dim(
            cache.length, view.length, slot, axis=0))


def prefill_paged(model: CosineSimCausalTransformer, params,
                  state: PagedDecodeState, slot, tokens: jax.Array,
                  true_len=None):
    """Prefill ONE request (tokens: (1, n)) into ``slot`` of the shared
    pools; other slots keep their pages untouched.  The slot's table row
    must already hold enough allocated pages.  Returns (last-token
    logits (1, vocab), new state)."""
    caches = list(state.caches)

    def attn(layer, q, k, v):
        view = _slot_view(caches[layer], slot)
        caches[layer] = _merge_view(caches[layer],
                                    append_paged(view, k, v), slot)
        from ..ops import flash_cosine_sim_attention
        return flash_cosine_sim_attention(
            q, k, v, causal=True, scale=model.attn_scale, l2norm_qk=False)

    x = _embed(model, params, tokens, jnp.zeros((1,), jnp.int32))
    logits = _transformer_pass(model, params, x, attn)
    if true_len is None:
        last = logits[:, -1]
        n_new = jnp.full((1,), tokens.shape[1], jnp.int32)
    else:
        idx = (true_len - 1)[:, None, None]
        last = jnp.take_along_axis(logits, idx, axis=1)[:, 0]
        n_new = true_len
    # truncate the slot's length to the TRUE prompt length: append_paged
    # advanced it by the full bucket-padded width, and pad positions must
    # never be attended by later decode steps (their K/V rows are
    # overwritten by the next real append)
    caches = [
        c._replace(length=jax.lax.dynamic_update_slice_in_dim(
            c.length, n_new, slot, 0))
        for c in caches
    ]
    pos = jax.lax.dynamic_update_slice_in_dim(state.pos, n_new, slot, 0)
    return last, PagedDecodeState(tuple(caches), pos)


def decode_step_paged(model: CosineSimCausalTransformer, params,
                      state: PagedDecodeState, token: jax.Array,
                      active: jax.Array):
    """One decode step for every slot; ``active`` (num_slots,) bool masks
    finished/empty slots (their caches and positions do not advance)."""
    caches = list(state.caches)

    def attn(layer, q, k, v):
        caches[layer] = append_paged(caches[layer], k, v, active=active)
        return paged_decode_attention(
            q, caches[layer], scale=model.attn_scale, l2norm_qk=False)

    x = _embed(model, params, token[:, None], state.pos)
    logits = _transformer_pass(model, params, x, attn)
    pos = state.pos + active.astype(jnp.int32)
    return logits[:, 0], PagedDecodeState(tuple(caches), pos)


def prefill_continue_paged(model: CosineSimCausalTransformer, params,
                           state: PagedDecodeState, slot,
                           tokens: jax.Array, true_len=None):
    """Multi-turn continuation against the PAGED cache (see
    ``prefill_continue``): the chunk attends the slot's gathered history
    pages (key-masked) and itself (causal); partials merge by the
    no-row-max sum.  The slot's table must already hold pages covering
    the chunk.  Inference-only."""
    from ..ops.fwd_kernel import flash_attention_forward
    from ..quant.kv_cache import K_SCALE

    caches = list(state.caches)
    pos0 = jax.lax.dynamic_slice_in_dim(state.pos, slot, 1, axis=0)
    n_new = (jnp.full((1,), tokens.shape[1], jnp.int32)
             if true_len is None else true_len)
    interp = jax.default_backend() != "tpu"

    def attn(layer, q, k, v):
        c = caches[layer]
        view = _slot_view(c, slot)
        hist_len = view.length                                   # (1,)
        # chunk vs itself
        o_new, inv_new = flash_attention_forward(
            q, k, v, None, None, bias_batch_dim=False,
            scale=model.attn_scale, causal=True, interpret=interp)
        # chunk vs gathered history pages (dequantized)
        ps, mp = c.page_size, c.max_pages
        table1 = view.page_table                                 # (1, mp)
        kvh, d = c.k8.shape[1], c.k8.shape[2]
        k_dq = 1.0 if c.is_fp8 else 1.0 / K_SCALE
        kh = (c.k8[table1].astype(jnp.float32) * k_dq)
        kh = kh.transpose(0, 2, 3, 1, 4).reshape(1, kvh, d, mp * ps)
        kh = kh.swapaxes(-1, -2).astype(q.dtype)      # (1, kvh, mp*ps, d)
        vh = c.v8[table1].astype(jnp.float32)
        if not c.is_fp8:
            vh = vh * c.v_scale[table1]
        vh = vh.transpose(0, 2, 3, 1, 4).reshape(1, kvh, d, mp * ps)
        vh = vh.swapaxes(-1, -2).astype(q.dtype)
        keep = (jnp.arange(mp * ps)[None, :] < hist_len[:, None])
        o_hist, inv_hist = flash_attention_forward(
            q, kh, vh, keep, None, bias_batch_dim=False,
            scale=model.attn_scale, causal=False, interpret=interp)
        l_new = 1.0 / inv_new
        l_hist = 1.0 / inv_hist
        l_tot = jnp.maximum(l_new + l_hist, 1e-10)
        o = (o_new.astype(jnp.float32) * l_new
             + o_hist.astype(jnp.float32) * l_hist) / l_tot
        # append the chunk through the slot view
        view = append_paged(view, k, v)
        view = view._replace(length=hist_len + n_new)
        caches[layer] = PagedKVCache(
            view.k8, view.v8, view.v_scale, c.page_table,
            jax.lax.dynamic_update_slice_in_dim(
                c.length, view.length, slot, axis=0))
        return o.astype(q.dtype)

    x = _embed(model, params, tokens, pos0)
    logits = _transformer_pass(model, params, x, attn)
    if true_len is None:
        last = logits[:, -1]
    else:
        idx = (true_len - 1)[:, None, None]
        last = jnp.take_along_axis(logits, idx, axis=1)[:, 0]
    pos = jax.lax.dynamic_update_slice_in_dim(
        state.pos, pos0 + n_new, slot, axis=0)
    return last, PagedDecodeState(tuple(caches), pos)


def generate_cached(
    model: CosineSimCausalTransformer,
    params,
    rng: jax.Array,
    prime: jax.Array,          # (b, n) int32 prompt
    seq_len: int,
    capacity: int,
    temperature: float = 1.0,
    filter_thres: float = 0.9,
) -> jax.Array:
    """Top-k sampling with the cached decode path (jits end-to-end)."""
    b = prime.shape[0]
    state = init_decode_state(model, b, capacity)
    logits, state = prefill(model, params, state, prime)

    def sample(rng, logits):
        filtered = top_k_filter(logits.astype(jnp.float32), filter_thres)
        return jax.random.categorical(rng, filtered / temperature, axis=-1)

    rng, sub = jax.random.split(rng)
    tok = sample(sub, logits)

    def step(carry, _):
        state, tok, rng = carry
        logits, state = decode_step(model, params, state, tok)
        rng, sub = jax.random.split(rng)
        nxt = sample(sub, logits)
        return (state, nxt, rng), tok

    (_, last, _), toks = jax.lax.scan(
        step, (state, tok, rng), None, length=seq_len - 1)
    out = jnp.concatenate([toks.T, last[:, None]], axis=1)
    return out.astype(jnp.int32)
