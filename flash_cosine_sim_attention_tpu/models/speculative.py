"""Speculative decoding: draft-model proposals, one-pass target verify.

Serving capability on top of the cached decode stack (no reference
counterpart; the reference's ``generate`` re-runs the full forward per
token, transformer.py:167-181).  The pieces this framework already has
make it short:

  * the DRAFT model decodes ``gamma`` tokens through its own INT8 cache
    (a ``lax.scan`` of decode_step);
  * the TARGET verifies all gamma proposals in ONE continuation-prefill
    pass (``prefill_continue``: the chunk attends the quantized history
    plus itself causally; partials merge by the no-row-max sum), giving
    gamma next-token distributions for the price of one chunk pass;
  * rejected suffixes roll back by SETTING the caches' explicit
    ``length``/``pos`` — stale K/V rows beyond the accepted prefix are
    simply overwritten by the next append (the same property bucketed
    prefill relies on).

Greedy acceptance reproduces the target's greedy sequence EXACTLY
(tested); sampled acceptance implements the standard speculative
rejection rule (Leviathan et al.), which preserves the target
distribution.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .decoding import (
    DecodeState,
    decode_step,
    init_decode_state,
    prefill,
)
from .transformer import CosineSimCausalTransformer


class SpecState(NamedTuple):
    target: DecodeState
    draft: DecodeState
    pending: jax.Array        # (1,) int32 — sampled, not yet consumed
    rng: jax.Array


def _rollback(state: DecodeState, new_len: jax.Array) -> DecodeState:
    """Truncate every layer's cache to ``new_len`` tokens (b=1)."""
    caches = tuple(
        c._replace(length=jnp.broadcast_to(new_len, c.length.shape))
        for c in state.caches)
    return DecodeState(caches, jnp.broadcast_to(new_len, state.pos.shape))


def _softmax_probs(logits, temperature):
    return jax.nn.softmax(logits.astype(jnp.float32) / temperature, -1)


def make_speculative_decoder(
    target: CosineSimCausalTransformer,
    draft: CosineSimCausalTransformer,
    gamma: int = 4,
    temperature: float = 0.0,
):
    """Build a jitted one-round speculative step.

    Returns ``round_fn(t_params, d_params, state) -> (state, tokens,
    n_emitted)`` where ``tokens`` is (gamma,) int32 with the first
    ``n_emitted`` entries valid.  ``temperature == 0`` -> greedy
    acceptance (exactly the target's greedy decode); otherwise the
    speculative rejection rule at that temperature.
    """

    def draft_propose(d_params, dstate, pending, rng):
        """gamma draft decode steps; returns proposals + their probs."""

        def step(carry, _):
            dstate, tok, rng = carry
            logits, dstate = decode_step(draft, d_params, dstate, tok)
            if temperature == 0.0:
                # greedy acceptance never reads draft probabilities
                probs = jnp.zeros_like(logits[0], jnp.float32)
                nxt = jnp.argmax(logits[0], -1).astype(jnp.int32)[None]
            else:
                probs = _softmax_probs(logits[0], temperature)
                rng, sub = jax.random.split(rng)
                nxt = jax.random.categorical(
                    sub, logits[0].astype(jnp.float32) / temperature
                )[None].astype(jnp.int32)
            return (dstate, nxt, rng), (nxt[0], probs)

        (dstate, _, rng), (toks, probs) = jax.lax.scan(
            step, (dstate, pending, rng), None, length=gamma)
        return dstate, toks, probs, rng

    def verify_rows(t_params, tstate, chunk):
        """One continuation pass returning EVERY position's logits
        (prefill_continue keeps only the last row)."""
        from .decoding import _embed, _transformer_pass  # shared trunk
        from ..ops.fwd_kernel import flash_attention_forward
        from ..quant import QuantKVCache, append, dequantize_k, dequantize_v

        caches = list(tstate.caches)
        pos0 = tstate.pos

        def attn(layer, q, k, v):
            c = caches[layer]
            hist_len = c.length
            o_new, inv_new = flash_attention_forward(
                q, k, v, None, None, bias_batch_dim=False,
                scale=target.attn_scale, causal=True,
                interpret=jax.default_backend() != "tpu")
            k_hist = dequantize_k(c.k8, q.dtype)
            v_hist = dequantize_v(c.v8, c.v_scale, q.dtype)
            keep = (jnp.arange(c.k8.shape[2])[None, :]
                    < hist_len[:, None])
            o_hist, inv_hist = flash_attention_forward(
                q, k_hist, v_hist, keep, None, bias_batch_dim=False,
                scale=target.attn_scale, causal=False,
                interpret=jax.default_backend() != "tpu")
            l_new = 1.0 / inv_new
            l_hist = 1.0 / inv_hist
            l_tot = jnp.maximum(l_new + l_hist, 1e-10)
            o = (o_new.astype(jnp.float32) * l_new
                 + o_hist.astype(jnp.float32) * l_hist) / l_tot
            caches[layer] = append(c, k, v)
            return o.astype(q.dtype)

        x = _embed(target, t_params, chunk, pos0)
        logits = _transformer_pass(target, t_params, x, attn)
        new_state = DecodeState(tuple(caches), pos0 + chunk.shape[1])
        return logits[0], new_state  # (gamma, vocab)

    @jax.jit
    def round_fn_rows(t_params, d_params, state: SpecState):
        tstate, dstate, pending, rng = state
        n0 = tstate.pos[0]

        dstate, drafts, dprobs, rng = draft_propose(
            d_params, dstate, pending, rng)

        chunk = jnp.concatenate([pending, drafts[:-1]])[None]
        rows, tstate = verify_rows(t_params, tstate, chunk)  # (gamma, V)

        if temperature == 0.0:
            t_choice = jnp.argmax(rows, -1).astype(jnp.int32)  # (gamma,)
            ok = t_choice == drafts
            # j = number of leading accepted drafts
            j = jnp.argmin(jnp.concatenate(
                [ok, jnp.zeros((1,), bool)]).astype(jnp.int32))
            replacement = t_choice[jnp.minimum(j, gamma - 1)]
        else:
            tprobs = _softmax_probs(rows, temperature)      # (gamma, V)
            rng, sub = jax.random.split(rng)
            u = jax.random.uniform(sub, (gamma,))
            pt = jnp.take_along_axis(tprobs, drafts[:, None], 1)[:, 0]
            pd = jnp.take_along_axis(dprobs, drafts[:, None], 1)[:, 0]
            ok = u < jnp.minimum(1.0, pt / jnp.maximum(pd, 1e-20))
            j = jnp.argmin(jnp.concatenate(
                [ok, jnp.zeros((1,), bool)]).astype(jnp.int32))
            jr = jnp.minimum(j, gamma - 1)
            # residual distribution max(p_t - p_d, 0) at the reject row
            resid = jnp.maximum(tprobs[jr] - dprobs[jr], 0.0)
            resid = resid / jnp.maximum(resid.sum(), 1e-20)
            rng, sub = jax.random.split(rng)
            replacement = jax.random.categorical(
                sub, jnp.log(jnp.maximum(resid, 1e-30))).astype(jnp.int32)

        full = j == gamma
        consumed = jnp.where(full, gamma, j + 1)
        new_pending = jnp.where(full, drafts[-1], replacement)[None]

        tstate = _rollback(tstate, n0 + consumed)
        dstate = _rollback(dstate, n0 + consumed)

        # emitted this round: drafts[0..j-1] then (d_gamma | replacement)
        idx = jnp.arange(gamma)
        emitted = jnp.where(idx < j, drafts,
                            jnp.where(idx == j, new_pending[0], -1))
        n_emitted = jnp.where(full, gamma, j + 1)
        return SpecState(tstate, dstate, new_pending, rng), emitted, n_emitted

    return round_fn_rows


def _verify_rows_batched(target, t_params, tstate, chunk, active):
    """Batched verify: one continuation pass over (slots, gamma) chunks
    returning EVERY position's logits (slots, gamma, vocab).

    Same two-phase attention as the b=1 verify (chunk attends the
    quantized history key-masked non-causal, plus itself causal; partials
    merge by the no-row-max sum), vectorized over slots: per-slot history
    lengths come from the caches' ``length`` vector, and ``active`` masks
    the cache append so frozen slots' lengths/positions do not advance
    (their ride-along writes land beyond their valid region, the same
    property the engines' decode steps rely on)."""
    from .decoding import _embed, _transformer_pass
    from ..ops.fwd_kernel import flash_attention_forward
    from ..quant import append, dequantize_k, dequantize_v

    caches = list(tstate.caches)
    pos0 = tstate.pos                                     # (slots,)
    interp = jax.default_backend() != "tpu"

    def attn(layer, q, k, v):
        c = caches[layer]
        hist_len = c.length                               # (slots,)
        o_new, inv_new = flash_attention_forward(
            q, k, v, None, None, bias_batch_dim=False,
            scale=target.attn_scale, causal=True, interpret=interp)
        k_hist = dequantize_k(c.k8, q.dtype)
        v_hist = dequantize_v(c.v8, c.v_scale, q.dtype)
        keep = (jnp.arange(c.k8.shape[2])[None, :] < hist_len[:, None])
        o_hist, inv_hist = flash_attention_forward(
            q, k_hist, v_hist, keep, None, bias_batch_dim=False,
            scale=target.attn_scale, causal=False, interpret=interp)
        l_new = 1.0 / inv_new
        l_hist = 1.0 / inv_hist
        l_tot = jnp.maximum(l_new + l_hist, 1e-10)
        o = (o_new.astype(jnp.float32) * l_new
             + o_hist.astype(jnp.float32) * l_hist) / l_tot
        caches[layer] = append(c, k, v, active=active)
        return o.astype(q.dtype)

    x = _embed(target, t_params, chunk, pos0)
    logits = _transformer_pass(target, t_params, x, attn)
    gamma = chunk.shape[1]
    new_pos = pos0 + gamma * active.astype(jnp.int32)
    return logits, DecodeState(tuple(caches), new_pos)


def make_batched_speculative_decoder(
    target: CosineSimCausalTransformer,
    draft: CosineSimCausalTransformer,
    gamma: int = 4,
    temperature: float = 0.0,
):
    """Multi-slot speculative round for continuous-batching engines.

    Returns ``round_fn(t_params, d_params, tstate, dstate, pending,
    active, rng) -> (tstate, dstate, pending, rng, emitted, n_emitted)``
    where every slot advances by its OWN accepted count in one device
    dispatch: ``emitted`` is (slots, gamma) int32 with each row's first
    ``n_emitted[slot]`` entries valid (inactive slots emit 0).
    ``temperature == 0`` reproduces each slot's target-greedy stream
    exactly; otherwise the standard speculative rejection rule applies
    per slot."""

    def draft_propose(d_params, dstate, pending, active, rng):
        def step(carry, _):
            dstate, tok, rng = carry
            logits, dstate = decode_step(draft, d_params, dstate, tok,
                                         active=active)
            if temperature == 0.0:
                probs = jnp.zeros_like(logits, jnp.float32)
                nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            else:
                probs = _softmax_probs(logits, temperature)
                rng, sub = jax.random.split(rng)
                nxt = jax.random.categorical(
                    sub, logits.astype(jnp.float32) / temperature
                ).astype(jnp.int32)
            nxt = jnp.where(active, nxt, tok)
            return (dstate, nxt, rng), (nxt, probs)

        (dstate, _, rng), (toks, probs) = jax.lax.scan(
            step, (dstate, pending, rng), None, length=gamma)
        return dstate, toks, probs, rng        # toks: (gamma, slots)

    @jax.jit
    def round_fn(t_params, d_params, tstate, dstate, pending, active, rng):
        slots = pending.shape[0]
        n0 = tstate.pos                                       # (slots,)
        act_i = active.astype(jnp.int32)

        dstate, drafts, dprobs, rng = draft_propose(
            d_params, dstate, pending, active, rng)
        drafts_t = drafts.T                                   # (slots, gamma)

        chunk = jnp.concatenate(
            [pending[:, None], drafts_t[:, :-1]], axis=1)     # (slots, gamma)
        rows, tstate = _verify_rows_batched(
            target, t_params, tstate, chunk, active)          # (slots, g, V)

        if temperature == 0.0:
            t_choice = jnp.argmax(rows, -1).astype(jnp.int32)  # (slots, g)
            ok = t_choice == drafts_t
            j = jnp.argmin(jnp.concatenate(
                [ok, jnp.zeros((slots, 1), bool)], 1).astype(jnp.int32), 1)
            jr = jnp.minimum(j, gamma - 1)
            replacement = jnp.take_along_axis(
                t_choice, jr[:, None], 1)[:, 0]
        else:
            tprobs = _softmax_probs(rows, temperature)        # (slots, g, V)
            rng, sub = jax.random.split(rng)
            u = jax.random.uniform(sub, (slots, gamma))
            pt = jnp.take_along_axis(
                tprobs, drafts_t[..., None], 2)[..., 0]
            pd = jnp.take_along_axis(
                dprobs.swapaxes(0, 1), drafts_t[..., None], 2)[..., 0]
            ok = u < jnp.minimum(1.0, pt / jnp.maximum(pd, 1e-20))
            j = jnp.argmin(jnp.concatenate(
                [ok, jnp.zeros((slots, 1), bool)], 1).astype(jnp.int32), 1)
            jr = jnp.minimum(j, gamma - 1)
            tp_r = jnp.take_along_axis(
                tprobs, jr[:, None, None], 1)[:, 0]           # (slots, V)
            dp_r = jnp.take_along_axis(
                dprobs.swapaxes(0, 1), jr[:, None, None], 1)[:, 0]
            resid = jnp.maximum(tp_r - dp_r, 0.0)
            resid = resid / jnp.maximum(resid.sum(-1, keepdims=True), 1e-20)
            rng, sub = jax.random.split(rng)
            replacement = jax.random.categorical(
                sub, jnp.log(jnp.maximum(resid, 1e-30)), axis=-1
            ).astype(jnp.int32)

        full = j == gamma
        consumed = jnp.where(full, gamma, j + 1) * act_i      # (slots,)
        new_pending = jnp.where(full, drafts_t[:, -1], replacement)
        new_pending = jnp.where(active, new_pending, pending)

        # per-slot rollback: lengths/positions to n0 + consumed (inactive
        # slots: consumed == 0 -> unchanged)
        new_len = n0 + consumed
        tcaches = tuple(
            c._replace(length=new_len) for c in tstate.caches)
        dcaches = tuple(
            c._replace(length=new_len) for c in dstate.caches)
        tstate = DecodeState(tcaches, new_len)
        dstate = DecodeState(dcaches, new_len)

        idx = jnp.arange(gamma)[None, :]
        emitted = jnp.where(
            idx < j[:, None], drafts_t,
            jnp.where(idx == j[:, None], new_pending[:, None], -1))
        n_emitted = jnp.where(full, gamma, j + 1) * act_i
        return tstate, dstate, new_pending, rng, emitted, n_emitted

    return round_fn


def speculative_generate(
    target: CosineSimCausalTransformer,
    t_params,
    draft: CosineSimCausalTransformer,
    d_params,
    rng: jax.Array,
    prime: jax.Array,            # (1, n) int32 prompt
    seq_len: int,
    capacity: int,
    gamma: int = 4,
    temperature: float = 0.0,
) -> Tuple[jax.Array, float]:
    """Generate ``seq_len`` tokens; returns (tokens (1, seq_len),
    mean accepted-per-round).  b=1 (speculative batching couples slot
    lengths; engines keep per-slot decode for batch serving)."""
    assert prime.shape[0] == 1, "speculative decoding is single-stream"
    # capacity guard: every round appends up to gamma tokens to both caches
    # BEFORE rolling back, so the high-water mark is prompt + generated +
    # gamma.  Without this, the dynamic_update_slice append would clamp its
    # write offset and silently overwrite the newest cache history (the
    # engines enforce the same invariant via their page/slot accounting).
    need = prime.shape[1] + seq_len + gamma
    if capacity < need:
        raise ValueError(
            f"capacity {capacity} too small: speculative decoding needs "
            f"prime ({prime.shape[1]}) + seq_len ({seq_len}) + gamma "
            f"({gamma}) = {need} cache rows")
    tstate = init_decode_state(target, 1, capacity)
    dstate = init_decode_state(draft, 1, capacity)

    t_logits, tstate = prefill(target, t_params, tstate, prime)
    _, dstate = prefill(draft, d_params, dstate, prime)
    if temperature == 0.0:
        pending = jnp.argmax(t_logits, -1).astype(jnp.int32)
    else:
        rng, sub = jax.random.split(rng)
        pending = jax.random.categorical(
            sub, t_logits.astype(jnp.float32) / temperature
        ).astype(jnp.int32)

    round_fn = make_speculative_decoder(target, draft, gamma, temperature)
    state = SpecState(tstate, dstate, pending, rng)

    out = [int(pending[0])]
    rounds = 0
    while len(out) < seq_len:
        state, emitted, n = round_fn(t_params, d_params, state)
        rounds += 1
        out.extend(int(t) for t in emitted[: int(n)])
    toks = jnp.asarray(out[:seq_len], jnp.int32)[None]
    return toks, (len(out) - 1) / max(rounds, 1)
