"""Ring attention: sequence parallelism over the mesh interconnect.

Scales context length beyond one chip (new vs the reference, whose long-
context story is single-device tiling — SURVEY.md §5): the sequence is
sharded over a mesh axis; each device keeps its Q shard resident and the
K/V shards rotate around the ring with ``ppermute`` while partial attention
accumulates locally.

The cosine-sim bounded-logit property makes this *simpler than standard
ring attention*: with no running row-max there is no max-rescaling when
merging partials — each rotation contributes un-normalized
``exp-weights @ V`` and a row-sum, merged by plain addition, and one divide
at the end (the same identity the single-chip kernel uses, cu:1239).

Fully differentiable (``jax.custom_vjp``): the backward runs the same
ring.  Because the global inverse row-sum from the forward makes each
(Q-shard, K/V-shard) pair's softmax partials EXACT (no max bookkeeping),
each rotation just calls the standard pairwise Pallas backward; dQ
accumulates locally, while dK/dV accumulate on f32 buffers that travel
the ring WITH their K/V shard and arrive back at the owner after the
full cycle — the sequence-parallel analogue of the atomics-free
two-kernel backward split.

Causality across shards is static structure: a K/V shard is either fully
visible (earlier in the sequence), diagonal (same shard: the kernel's own
causal mask), or fully masked (later) — chosen per rotation with
``lax.switch`` on the rotating shard's global index.
"""

from __future__ import annotations

import functools
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.blocks import EPS
from ..ops.bwd_kernel import flash_attention_backward
from ..ops.fwd_kernel import flash_attention_forward
from ..ops.reference import l2norm_tensors


@functools.lru_cache(maxsize=None)
def _make_ring(axis_name: str, scale: float, causal: bool, interpret: bool,
               has_mask: bool):
    """Per-shard differentiable ring attention for one static config.

    GQA flows through naturally (the pairwise kernels index KV heads);
    a key mask (sharded like K) rotates around the ring WITH its K/V
    shard.  dK/dV accumulators travel the ring in the INPUT dtype
    (bf16 inputs -> bf16 transport, halving per-hop grad bytes vs the
    f32 carry; f32 inputs keep exact f32 transport).
    """

    fwd_pair = partial(
        flash_attention_forward, bias=None,
        bias_batch_dim=False, scale=scale, interpret=interpret)
    bwd_pair = partial(
        flash_attention_backward, bias=None,
        bias_batch_dim=False, scale=scale, interpret=interpret)

    def _case(me, g):
        # 0 = fully visible (earlier shard), 1 = diagonal, 2 = masked
        return jnp.where(g < me, 0, jnp.where(g == me, 1, 2))

    def _mask_of(m_cur):
        # mask travels as the q dtype (custom_vjp wants float cotangents);
        # None when the config has no mask
        return (m_cur > 0) if has_mask else None

    def _ring_forward(qn, kn, v, mask_f):
        size = jax.lax.axis_size(axis_name)
        me = jax.lax.axis_index(axis_name)
        b, h, n_local, d = qn.shape
        perm = [(i, (i + 1) % size) for i in range(size)]

        def partial_full(args):
            qq, kk, vv, mm = args
            o, inv_l = fwd_pair(qq, kk, vv, mask=_mask_of(mm), causal=False)
            lsum = 1.0 / inv_l                      # exact: no row-max
            return o.astype(jnp.float32) * lsum, lsum

        def partial_diag(args):
            qq, kk, vv, mm = args
            # the public API forbids causal+mask together (reference
            # parity), but the kernels themselves compose both: the
            # diagonal shard is a single causal+key-masked call
            o, inv_l = fwd_pair(qq, kk, vv, mask=_mask_of(mm), causal=True)
            lsum = 1.0 / inv_l
            return o.astype(jnp.float32) * lsum, lsum

        def partial_masked(args):
            return (jnp.zeros((b, h, n_local, d), jnp.float32),
                    jnp.zeros((b, h, n_local, 1), jnp.float32))

        def body(s, carry):
            o_acc, l_acc, k_cur, v_cur, m_cur = carry
            g = (me - s) % size
            args = (qn, k_cur, v_cur, m_cur)
            if causal:
                o_p, l_p = jax.lax.switch(
                    _case(me, g),
                    [partial_full, partial_diag, partial_masked], args)
            else:
                o_p, l_p = partial_full(args)
            o_acc = o_acc + o_p
            l_acc = l_acc + l_p
            k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
            v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
            if has_mask:
                m_cur = jax.lax.ppermute(m_cur, axis_name, perm)
            return o_acc, l_acc, k_cur, v_cur, m_cur

        o0 = jnp.zeros((b, h, n_local, d), jnp.float32)
        l0 = jnp.zeros((b, h, n_local, 1), jnp.float32)
        o_acc, l_acc, *_ = jax.lax.fori_loop(
            0, size, body, (o0, l0, kn, v, mask_f))

        inv_l = 1.0 / jnp.maximum(l_acc, EPS)       # (b, h, n_local, 1)
        o = (o_acc * inv_l).astype(qn.dtype)
        return o, inv_l

    @jax.custom_vjp
    def ring(qn, kn, v, mask_f):
        o, _ = _ring_forward(qn, kn, v, mask_f)
        return o

    def ring_fwd(qn, kn, v, mask_f):
        o, inv_l = _ring_forward(qn, kn, v, mask_f)
        return o, (qn, kn, v, mask_f, o, inv_l)

    def ring_bwd(res, do):
        qn, kn, v, mask_f, o, inv_l = res
        size = jax.lax.axis_size(axis_name)
        me = jax.lax.axis_index(axis_name)
        perm = [(i, (i + 1) % size) for i in range(size)]
        tdtype = kn.dtype  # grad transport dtype = input dtype

        def grads_full(args):
            qq, kk, vv, mm = args
            # the GLOBAL inv_l makes each pair's softmax partial exact,
            # so the standard pairwise backward applies per rotation
            dq, dk, dv, _ = bwd_pair(do, o, inv_l, qq, kk, vv,
                                     mask=_mask_of(mm), causal=False)
            return (dq.astype(jnp.float32), dk.astype(jnp.float32),
                    dv.astype(jnp.float32))

        def grads_diag(args):
            qq, kk, vv, mm = args
            dq, dk, dv, _ = bwd_pair(do, o, inv_l, qq, kk, vv,
                                     mask=_mask_of(mm), causal=True)
            return (dq.astype(jnp.float32), dk.astype(jnp.float32),
                    dv.astype(jnp.float32))

        def grads_masked(args):
            qq, kk, vv, _ = args
            return (jnp.zeros(qq.shape, jnp.float32),
                    jnp.zeros(kk.shape, jnp.float32),
                    jnp.zeros(vv.shape, jnp.float32))

        def body(s, carry):
            dq_acc, k_cur, v_cur, m_cur, dk_acc, dv_acc = carry
            g = (me - s) % size
            args = (qn, k_cur, v_cur, m_cur)
            if causal:
                dq_p, dk_p, dv_p = jax.lax.switch(
                    _case(me, g),
                    [grads_full, grads_diag, grads_masked], args)
            else:
                dq_p, dk_p, dv_p = grads_full(args)
            dq_acc = dq_acc + dq_p
            # dk/dv travel WITH their k shard, in the input dtype (half
            # the per-hop grad bytes for bf16; exact for f32)
            dk_acc = (dk_acc.astype(jnp.float32) + dk_p).astype(tdtype)
            dv_acc = (dv_acc.astype(jnp.float32) + dv_p).astype(tdtype)
            k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
            v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
            if has_mask:
                m_cur = jax.lax.ppermute(m_cur, axis_name, perm)
            dk_acc = jax.lax.ppermute(dk_acc, axis_name, perm)
            dv_acc = jax.lax.ppermute(dv_acc, axis_name, perm)
            return dq_acc, k_cur, v_cur, m_cur, dk_acc, dv_acc

        dq0 = jnp.zeros(qn.shape, jnp.float32)
        dk0 = jnp.zeros(kn.shape, tdtype)
        dv0 = jnp.zeros(v.shape, tdtype)
        dq, _, _, _, dk, dv = jax.lax.fori_loop(
            0, size, body, (dq0, kn, v, mask_f, dk0, dv0))
        # after `size` rotations the accumulators are back at their owner
        dmask = (jnp.zeros_like(mask_f) if mask_f is not None else None)
        return (dq.astype(qn.dtype), dk.astype(kn.dtype),
                dv.astype(v.dtype), dmask)

    ring.defvjp(ring_fwd, ring_bwd)
    return ring


def ring_flash_cosine_sim_attention(
    q: jax.Array,   # (b, h, n, d), n sharded over ``axis_name``
    k: jax.Array,   # (b, kvh, n, d) with kvh dividing h (GQA / MQA ok)
    v: jax.Array,
    mesh: Mesh,
    mask: Optional[jax.Array] = None,   # (b, n) bool key mask
    axis_name: str = "seq",
    scale: float = 8.0,
    groups: int = 1,
    causal: bool = True,
    l2norm_qk: bool = True,
    model_axis: Optional[str] = None,
    data_axis: Optional[str] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Sequence-parallel attention over ``axis_name``; composes with head
    TP (``model_axis``) and batch DP (``data_axis``) on a multi-axis mesh
    — heads and batch are embarrassingly parallel, so each (data, model)
    shard runs its own independent ring over the seq axis.

    ``mask`` shards like K and rotates the ring with its shard; GQA KV
    heads shard over ``model_axis`` when divisible, else replicate.
    Mask and causal compose here (the diagonal shard applies both) —
    the ring has no reason to inherit the public API's exclusivity."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    spec = P(data_axis, model_axis, axis_name, None)
    kvh, h = k.shape[1], q.shape[1]
    kv_model = model_axis
    if model_axis is not None and kvh % mesh.shape[model_axis] != 0:
        if kvh > 1:
            # replicating 1 < kvh < h KV heads while q is head-sharded
            # would remap query groups to the wrong KV head inside the
            # shard (the kernel recomputes q_per_kv from LOCAL counts):
            # repeat to full heads and shard like q instead
            k = jnp.repeat(k, h // kvh, axis=1)
            v = jnp.repeat(v, h // kvh, axis=1)
        else:
            kv_model = None  # MQA: replicate (all q heads -> KV head 0)
    kv_spec = P(data_axis, kv_model, axis_name, None)
    mask_spec = P(data_axis, axis_name)
    ring = _make_ring(axis_name, float(scale), bool(causal),
                      bool(interpret), mask is not None)

    def inner(q, k, v, *m):
        if l2norm_qk:
            qn, kn = l2norm_tensors(q, k, groups=groups)
        else:
            qn, kn = q, k
        return ring(qn, kn, v, m[0] if m else None)

    in_specs = (spec, kv_spec, kv_spec) + (
        (mask_spec,) if mask is not None else ())
    f = jax.shard_map(
        inner, mesh=mesh, in_specs=in_specs, out_specs=spec,
        check_vma=False,
    )
    if mask is None:
        return f(q, k, v)
    # mask travels as the q dtype: custom_vjp wants float cotangents
    return f(q, k, v, mask.astype(q.dtype))
