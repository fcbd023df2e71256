"""Continuous-batching engine over the PAGED quantized KV cache.

Same interface as ``InferenceEngine`` (engine.py), but all slots draw
pages from one shared pool per layer, so device memory scales with
tokens actually in flight: a request holds ceil(len/page_size) pages and
returns them to the free list the moment it finishes, instead of every
slot permanently owning a max-capacity buffer.

Host-side policy / device-side mechanism split:
  * the engine (host) owns the PageAllocator and writes page ids into
    the table rows before any device step touches them;
  * prefill/decode (device, jitted) only read the table — they never
    allocate.  A finished slot's row is reset to the null page so its
    masked rides-along writes can't corrupt reallocated pages.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.decoding import (
    PagedDecodeState,
    decode_step_paged,
    init_paged_decode_state,
    prefill_continue_paged,
    prefill_paged,
)
from ..models.transformer import top_k_filter
from ..quant.paged import PageAllocator


def _bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"prompt length {n} exceeds largest bucket {buckets[-1]}")


class PagedInferenceEngine:
    def __init__(
        self,
        model,
        params,
        num_slots: int = 8,
        page_size: int = 128,
        num_pages: int = 256,
        max_pages_per_slot: int = 16,
        reserve_tokens: int = 512,
        temperature: float = 1.0,
        filter_thres: float = 0.9,
        prompt_buckets: Tuple[int, ...] = (128, 256, 512, 1024),
        seed: int = 0,
        kv_dtype=None,
    ):
        kv_dtype = kv_dtype if kv_dtype is not None else jnp.int8
        self.model = model
        self.params = params
        self.num_slots = num_slots
        self.page_size = page_size
        self.max_pages = max_pages_per_slot
        self.reserve_tokens = reserve_tokens
        self.buckets = tuple(
            b for b in prompt_buckets if b <= max_pages_per_slot * page_size)
        self.temperature = temperature
        self.filter_thres = filter_thres

        self.state = init_paged_decode_state(
            model, num_slots, num_pages, page_size, max_pages_per_slot,
            kv_dtype=kv_dtype)
        self.allocator = PageAllocator(num_pages)
        self.slot_pages: List[List[int]] = [[] for _ in range(num_slots)]
        self.table = np.zeros((num_slots, max_pages_per_slot), np.int32)
        self.active = np.zeros(num_slots, bool)
        self.last_token = np.zeros(num_slots, np.int32)
        self._rng = jax.random.PRNGKey(seed)

        def _sample(rng, logits):
            filtered = top_k_filter(
                logits.astype(jnp.float32), self.filter_thres)
            return jax.random.categorical(
                rng, filtered / self.temperature, axis=-1)

        @jax.jit
        def _prefill(params, state, slot, tokens, true_len, rng):
            logits, state = prefill_paged(
                self.model, params, state, slot, tokens, true_len=true_len)
            return _sample(rng, logits), state

        @jax.jit
        def _decode(params, state, tokens, active, rng):
            logits, state = decode_step_paged(
                self.model, params, state, tokens, active)
            return _sample(rng, logits), state

        @jax.jit
        def _continue(params, state, slot, tokens, true_len, rng):
            logits, state = prefill_continue_paged(
                self.model, params, state, slot, tokens, true_len=true_len)
            return _sample(rng, logits), state

        self._prefill = _prefill
        self._decode = _decode
        self._continue = _continue

    # ------------------------------------------------------------------
    def free_slots(self) -> List[int]:
        return [i for i in range(self.num_slots) if not self.active[i]]

    def _sync_table(self):
        self.state = PagedDecodeState(
            tuple(c._replace(page_table=jnp.asarray(self.table))
                  for c in self.state.caches),
            self.state.pos,
        )

    def add_request(self, prompt: np.ndarray) -> int:
        free = self.free_slots()
        if not free:
            raise RuntimeError("no free slots")
        slot = free[0]
        n = len(prompt)
        width = _bucket(n, self.buckets)

        n_pages = min(
            (n + self.reserve_tokens + self.page_size - 1) // self.page_size,
            self.max_pages)
        pages = self.allocator.alloc(n_pages)
        self.slot_pages[slot] = pages
        self.table[slot, :] = 0
        self.table[slot, :n_pages] = pages
        # positions within the slot restart from zero
        self.state = self.state._replace(
            pos=self.state.pos.at[slot].set(0))
        st_caches = tuple(
            c._replace(length=c.length.at[slot].set(0))
            for c in self.state.caches)
        self.state = self.state._replace(caches=st_caches)
        self._sync_table()

        padded = np.zeros((1, width), np.int32)
        padded[0, :n] = prompt
        self._rng, sub = jax.random.split(self._rng)
        tok, self.state = self._prefill(
            self.params, self.state, jnp.int32(slot),
            jnp.asarray(padded), jnp.asarray([n], jnp.int32), sub)
        self.last_token[slot] = int(tok[0])
        self.active[slot] = True
        return slot

    def continue_request(self, slot: int, new_tokens: np.ndarray) -> int:
        """Multi-turn: extend an ACTIVE slot with a new prompt chunk in one
        prefill pass (allocates pages for the chunk first)."""
        if not self.active[slot]:
            raise RuntimeError(f"slot {slot} is not active")
        n = len(new_tokens)
        width = _bucket(n, self.buckets)
        used = int(self.state.pos[slot])
        need_pages = (used + n + self.page_size - 1) // self.page_size
        have = len(self.slot_pages[slot])
        if need_pages > self.max_pages:
            raise RuntimeError(
                f"slot {slot}: continuation exceeds max pages")
        if need_pages > have:
            new = self.allocator.alloc(need_pages - have)
            for i, p in enumerate(new):
                self.table[slot, have + i] = p
            self.slot_pages[slot].extend(new)
            self._sync_table()
        padded = np.zeros((1, width), np.int32)
        padded[0, :n] = new_tokens
        self._rng, sub = jax.random.split(self._rng)
        tok, self.state = self._continue(
            self.params, self.state, jnp.int32(slot), jnp.asarray(padded),
            jnp.asarray([n], jnp.int32), sub)
        self.last_token = np.array(self.last_token)
        self.last_token[slot] = int(tok[0])
        return int(tok[0])

    def step(self) -> Dict[int, int]:
        """One decode step for every active slot -> {slot: token}."""
        if not self.active.any():
            return {}
        # grow any slot about to cross a page boundary
        for s in range(self.num_slots):
            if not self.active[s]:
                continue
            used = int(self.state.pos[s])
            have = len(self.slot_pages[s]) * self.page_size
            if used + 1 > have:
                if len(self.slot_pages[s]) >= self.max_pages:
                    raise RuntimeError(f"slot {s} exceeded max pages")
                new = self.allocator.alloc(1)[0]
                idx = len(self.slot_pages[s])
                self.slot_pages[s].append(new)
                self.table[s, idx] = new
                self._sync_table()

        self._rng, sub = jax.random.split(self._rng)
        toks, self.state = self._decode(
            self.params, self.state, jnp.asarray(self.last_token),
            jnp.asarray(self.active), sub)
        toks = np.asarray(toks)
        out = {}
        for s in range(self.num_slots):
            if self.active[s]:
                self.last_token[s] = toks[s]
                out[s] = int(toks[s])
        return out

    def finish(self, slot: int) -> None:
        self.active[slot] = False
        self.allocator.release(self.slot_pages[slot])
        self.slot_pages[slot] = []
        self.table[slot, :] = 0   # null page: masked ride-along writes
        self._sync_table()

    def pages_in_use(self) -> int:
        return sum(len(p) for p in self.slot_pages)

    def generate(self, prompt: np.ndarray, max_tokens: int) -> List[int]:
        slot = self.add_request(prompt)
        out = [int(self.last_token[slot])]
        for _ in range(max_tokens - 1):
            out.append(self.step()[slot])
        self.finish(slot)
        return out
