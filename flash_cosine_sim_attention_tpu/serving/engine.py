"""Continuous-batching inference engine over the INT8-KV decode path.

Serving runtime the reference never had (north star: "continuous batching
across hosts").  Single-host engine:

  * a fixed pool of batch slots, each with its own per-layer INT8 KV cache
    rows and position (per-slot lengths — see quant/kv_cache.py);
  * ``add_request`` prefills a prompt (right-padded to a length bucket —
    exact under causal attention since later pads are never attended) and
    scatters its cache rows into a free slot while other slots keep
    decoding;
  * ``step`` advances ALL active slots one token with a single jitted
    decode+sample call (inactive slots ride along masked; their caches are
    overwritten on reuse).

Everything device-side is jitted with a bounded set of shapes (one decode
shape + one prefill shape per bucket), so steady-state serving never
recompiles.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.decoding import (
    DecodeState,
    decode_step,
    init_decode_state,
    prefill,
    prefill_continue,
)
from ..models.transformer import top_k_filter


def _bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"prompt length {n} exceeds largest bucket {buckets[-1]}")


class InferenceEngine:
    def __init__(
        self,
        model,
        params,
        num_slots: int = 8,
        capacity: int = 2048,
        temperature: float = 1.0,
        filter_thres: float = 0.9,
        prompt_buckets: Tuple[int, ...] = (128, 256, 512, 1024),
        seed: int = 0,
        kv_dtype=None,
        mesh=None,
    ):
        """``mesh`` enables serving tensor-parallelism: params shard by the
        megatron TP rules, the KV caches shard batch->data / kv-heads->
        model, and attention routes through the head-sharded paths.  Use a
        (data=1, model=N) mesh — prefill runs one request at a time."""
        kv_dtype = kv_dtype if kv_dtype is not None else jnp.int8
        self.model = model
        self.mesh = mesh
        if mesh is not None:
            from ..parallel import shard_params
            params = shard_params(params, mesh)
        self.params = params
        self.num_slots = num_slots
        self.capacity = capacity
        self.buckets = tuple(b for b in prompt_buckets if b <= capacity)
        self.temperature = temperature
        self.filter_thres = filter_thres
        self.kv_dtype = kv_dtype
        self.state = init_decode_state(model, num_slots, capacity,
                                       kv_dtype=kv_dtype)
        if mesh is not None:
            from ..parallel import shard_cache
            self.state = DecodeState(
                tuple(shard_cache(c, mesh) for c in self.state.caches),
                self.state.pos)
        self.active = np.zeros(num_slots, bool)
        self.last_token = np.zeros(num_slots, np.int32)
        self._rng = jax.random.PRNGKey(seed)

        def _sample(rng, logits):
            filtered = top_k_filter(
                logits.astype(jnp.float32), self.filter_thres)
            return jax.random.categorical(
                rng, filtered / self.temperature, axis=-1)

        @jax.jit
        def _decode_and_sample(params, state, tokens, rng):
            logits, state = decode_step(self.model, params, state, tokens,
                                        mesh=self.mesh)
            return _sample(rng, logits), state

        @jax.jit
        def _prefill_one(params, tokens, true_len, rng):
            """Bucketed batch-1 prefill; exact because causal attention
            never attends right-pads."""
            st = init_decode_state(self.model, 1, self.capacity,
                                   kv_dtype=self.kv_dtype)
            logits_last, st = prefill(self.model, params, st, tokens,
                                      true_len=true_len, mesh=self.mesh)
            tok = _sample(rng, logits_last)
            # fix up lengths/pos to the true (unpadded) values
            caches = tuple(c._replace(length=true_len) for c in st.caches)
            return tok, DecodeState(caches, true_len)

        @jax.jit
        def _insert(state, one, slot, last_tokens, tok):
            caches = tuple(
                c._replace(
                    k8=c.k8.at[slot].set(o.k8[0]),
                    v8=c.v8.at[slot].set(o.v8[0]),
                    v_scale=c.v_scale.at[slot].set(o.v_scale[0]),
                    length=c.length.at[slot].set(o.length[0]),
                )
                for c, o in zip(state.caches, one.caches))
            pos = state.pos.at[slot].set(one.pos[0])
            last_tokens = last_tokens.at[slot].set(tok[0])
            return DecodeState(caches, pos), last_tokens

        @jax.jit
        def _continue(params, state, slot, tokens, true_len, rng):
            logits, state = prefill_continue(
                self.model, params, state, slot, tokens, true_len=true_len)
            return _sample(rng, logits), state

        self._decode_and_sample = _decode_and_sample
        self._prefill_one = _prefill_one
        self._insert = _insert
        self._continue = _continue

    # ------------------------------------------------------------------
    def free_slots(self) -> List[int]:
        return [i for i in range(self.num_slots) if not self.active[i]]

    def add_request(self, prompt: np.ndarray) -> int:
        """Prefill ``prompt`` (1-D int array) into a free slot; returns it."""
        free = self.free_slots()
        if not free:
            raise RuntimeError("no free slots")
        slot = free[0]
        n = len(prompt)
        width = _bucket(n, self.buckets)
        padded = np.zeros((1, width), np.int32)
        padded[0, :n] = prompt
        self._rng, sub = jax.random.split(self._rng)
        tok, one = self._prefill_one(
            self.params, jnp.asarray(padded),
            jnp.asarray([n], jnp.int32), sub)
        last = jnp.asarray(self.last_token)
        self.state, last = self._insert(self.state, one, slot, last, tok)
        self.last_token = np.asarray(last)
        self.active[slot] = True
        return slot

    def continue_request(self, slot: int, new_tokens: np.ndarray) -> int:
        """Multi-turn: extend an ACTIVE slot's context with a new chunk of
        prompt tokens in one prefill pass (chunk attends the quantized
        history + itself; partials merge by the no-row-max sum).  Returns
        the token sampled after the chunk."""
        if not self.active[slot]:
            raise RuntimeError(f"slot {slot} is not active")
        n = len(new_tokens)
        width = _bucket(n, self.buckets)
        # guard on the PADDED width, not n: prefill_continue appends the
        # whole bucket-padded chunk, and dynamic_update_slice would clamp
        # a partially-out-of-range write back to capacity-width, silently
        # shifting the chunk left over valid history
        if int(self.state.pos[slot]) + width > self.capacity:
            raise RuntimeError(
                f"slot {slot}: continuation (bucket-padded to {width}) "
                f"would exceed capacity {self.capacity}")
        padded = np.zeros((1, width), np.int32)
        padded[0, :n] = new_tokens
        self._rng, sub = jax.random.split(self._rng)
        tok, self.state = self._continue(
            self.params, self.state, jnp.int32(slot), jnp.asarray(padded),
            jnp.asarray([n], jnp.int32), sub)
        # np.asarray of a jax array is read-only; copy before item-assign
        self.last_token = np.array(self.last_token)
        self.last_token[slot] = int(tok[0])
        return int(tok[0])

    def step(self) -> Dict[int, int]:
        """One decode step for every active slot -> {slot: token}."""
        if not self.active.any():
            return {}
        # a slot at capacity must not decode further: the append would
        # clamp its write offset (dynamic_update_slice semantics) and
        # silently overwrite the newest cache entry
        pos = np.asarray(self.state.pos)
        over = [s for s in range(self.num_slots)
                if self.active[s] and pos[s] + 1 > self.capacity]
        if over:
            raise RuntimeError(
                f"slots {over} reached cache capacity {self.capacity}; "
                f"finish() them before stepping")
        self._rng, sub = jax.random.split(self._rng)
        toks, self.state = self._decode_and_sample(
            self.params, self.state, jnp.asarray(self.last_token), sub)
        self.last_token = np.asarray(toks)
        return {i: int(self.last_token[i])
                for i in range(self.num_slots) if self.active[i]}

    def finish(self, slot: int) -> None:
        self.active[slot] = False

    def generate(self, prompt: np.ndarray, max_tokens: int) -> List[int]:
        """Convenience single-request path (prefill token + decode steps)."""
        slot = self.add_request(prompt)
        out = [int(self.last_token[slot])]
        for _ in range(max_tokens - 1):
            out.append(self.step()[slot])
        self.finish(slot)
        return out
