"""Speculative continuous-batching engine: per-slot draft + verify rounds.

Engine-level speculative decoding (r2 VERDICT item 8): every active slot
advances by its OWN accepted-token count each round, in one device
dispatch for the draft scan + one for the batched verify — the
multi-slot generalization of ``models.speculative`` (which is b=1).

Layout mirrors ``InferenceEngine``: a fixed pool of slots, each backed by
TWO per-layer INT8 KV caches (target + draft, kept in lockstep lengths),
bucketed prefill admission, host-mirrored positions.  ``step_round()``
returns the ragged {slot: [accepted tokens...]} of one speculative round;
``temperature=0`` reproduces each slot's target-greedy stream exactly.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.decoding import DecodeState, init_decode_state, prefill
from ..models.speculative import make_batched_speculative_decoder


def _bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"prompt length {n} exceeds largest bucket {buckets[-1]}")


class SpeculativeEngine:
    def __init__(
        self,
        target,
        t_params,
        draft,
        d_params,
        num_slots: int = 8,
        capacity: int = 2048,
        gamma: int = 4,
        temperature: float = 0.0,
        prompt_buckets: Tuple[int, ...] = (128, 256, 512, 1024),
        seed: int = 0,
    ):
        self.target, self.t_params = target, t_params
        self.draft, self.d_params = draft, d_params
        self.num_slots = num_slots
        self.capacity = capacity
        self.gamma = gamma
        self.buckets = tuple(b for b in prompt_buckets if b <= capacity)
        self.tstate = init_decode_state(target, num_slots, capacity)
        self.dstate = init_decode_state(draft, num_slots, capacity)
        self.active = np.zeros(num_slots, bool)
        self.host_pos = np.zeros(num_slots, np.int64)
        self._pending = jnp.zeros((num_slots,), jnp.int32)
        self._rng = jax.random.PRNGKey(seed)
        self._round = make_batched_speculative_decoder(
            target, draft, gamma=gamma, temperature=temperature)
        self.temperature = temperature

        @jax.jit
        def _prefill_pair(t_params, d_params, tokens, true_len, rng):
            """Bucketed batch-1 prefill of BOTH caches; the first pending
            token comes from the TARGET's logits (greedy: argmax)."""
            t1 = init_decode_state(self.target, 1, self.capacity)
            d1 = init_decode_state(self.draft, 1, self.capacity)
            t_logits, t1 = prefill(self.target, t_params, t1, tokens,
                                   true_len=true_len)
            _, d1 = prefill(self.draft, d_params, d1, tokens,
                            true_len=true_len)
            if self.temperature == 0.0:
                tok = jnp.argmax(t_logits, -1).astype(jnp.int32)
            else:
                rng, sub = jax.random.split(rng)
                tok = jax.random.categorical(
                    sub, t_logits.astype(jnp.float32) / self.temperature
                ).astype(jnp.int32)
            return t1, d1, tok, rng

        @jax.jit
        def _insert(state, one, slot):
            caches = tuple(
                c._replace(
                    k8=c.k8.at[slot].set(o.k8[0]),
                    v8=c.v8.at[slot].set(o.v8[0]),
                    v_scale=c.v_scale.at[slot].set(o.v_scale[0]),
                    length=c.length.at[slot].set(o.length[0]),
                )
                for c, o in zip(state.caches, one.caches))
            return DecodeState(caches, state.pos.at[slot].set(one.pos[0]))

        self._prefill_pair = _prefill_pair
        self._insert = _insert

    # ------------------------------------------------------------------
    def free_slots(self) -> List[int]:
        return [i for i in range(self.num_slots) if not self.active[i]]

    def add_request(self, prompt: np.ndarray) -> Tuple[int, int]:
        """Prefill into a free slot; returns (slot, first sampled token)."""
        free = self.free_slots()
        if not free:
            raise RuntimeError("no free slots")
        slot = free[0]
        n = len(prompt)
        if n > self.capacity:
            raise ValueError(
                f"prompt length {n} exceeds capacity {self.capacity}")
        width = _bucket(n, self.buckets)
        padded = np.zeros((1, width), np.int32)
        padded[0, :n] = prompt
        t1, d1, tok, self._rng = self._prefill_pair(
            self.t_params, self.d_params, jnp.asarray(padded),
            jnp.asarray([n], jnp.int32), self._rng)
        self.tstate = self._insert(self.tstate, t1, slot)
        self.dstate = self._insert(self.dstate, d1, slot)
        self._pending = self._pending.at[slot].set(tok[0])
        self.host_pos[slot] = n
        self.active[slot] = True
        return slot, int(tok[0])

    def step_round(self) -> Dict[int, List[int]]:
        """One speculative round for every active slot ->
        {slot: [accepted tokens...]} (1..gamma tokens per slot)."""
        if not self.active.any():
            return {}
        # active slots must fit a whole round: past capacity the
        # ride-along append would CLAMP its write offset back over valid
        # history.  Inactive slots also take the ride-along, but their
        # (possibly clamped) writes only touch dead data — add_request
        # fully overwrites a slot's caches on reuse — so a finished slot
        # parked near capacity must NOT wedge the engine.
        over = [s for s in range(self.num_slots)
                if self.active[s]
                and self.host_pos[s] + self.gamma > self.capacity]
        if over:
            raise RuntimeError(
                f"slots {over} would exceed capacity {self.capacity} "
                f"within one round (gamma={self.gamma}); finish() them")
        active = jnp.asarray(self.active)
        (self.tstate, self.dstate, self._pending, self._rng,
         emitted, n_emitted) = self._round(
            self.t_params, self.d_params, self.tstate, self.dstate,
            self._pending, active, self._rng)
        emitted = np.asarray(emitted)         # the ONE fetch per round
        n_emitted = np.asarray(n_emitted)
        out = {}
        for s in range(self.num_slots):
            if self.active[s] and n_emitted[s] > 0:
                out[s] = [int(t) for t in emitted[s, : n_emitted[s]]]
                self.host_pos[s] += int(n_emitted[s])
        return out

    def finish(self, slot: int) -> None:
        self.active[slot] = False
