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

Causality across shards is static structure: a K/V shard is either fully
visible (earlier in the sequence), diagonal (same shard: the kernel's own
causal mask), or fully masked (later) — chosen per rotation with
``lax.switch`` on the rotating shard's global index.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.blocks import EPS
from ..ops.fwd_kernel import flash_attention_forward
from ..ops.reference import l2norm_tensors


def ring_flash_cosine_sim_attention(
    q: jax.Array,   # (b, h, n, d), n sharded over ``axis_name``
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis_name: str = "seq",
    scale: float = 8.0,
    groups: int = 1,
    causal: bool = True,
    l2norm_qk: bool = True,
    interpret: Optional[bool] = None,
) -> jax.Array:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    spec = P(None, None, axis_name, None)

    def inner(q, k, v):
        if l2norm_qk:
            qn, kn = l2norm_tensors(q, k, groups=groups)
        else:
            qn, kn = q, k
        size = jax.lax.axis_size(axis_name)
        me = jax.lax.axis_index(axis_name)
        b, h, n_local, d = qn.shape

        fwd = partial(
            flash_attention_forward,
            mask=None, bias=None, bias_batch_dim=False, scale=scale,
            interpret=interpret,
        )

        def partial_full(args):
            qq, kk, vv = args
            o, inv_l = fwd(qq, kk, vv, causal=False)
            lsum = 1.0 / inv_l                      # exact: no row-max
            return o.astype(jnp.float32) * lsum, lsum

        def partial_diag(args):
            qq, kk, vv = args
            o, inv_l = fwd(qq, kk, vv, causal=True)
            lsum = 1.0 / inv_l
            return o.astype(jnp.float32) * lsum, lsum

        def partial_masked(args):
            qq, _, _ = args
            return (jnp.zeros((b, h, n_local, d), jnp.float32),
                    jnp.zeros((b, h, n_local, 1), jnp.float32))

        perm = [(i, (i + 1) % size) for i in range(size)]

        def body(s, carry):
            o_acc, l_acc, k_cur, v_cur = carry
            # the shard currently held arrived from device (me - s) % size
            g = (me - s) % size
            if causal:
                case = jnp.where(g < me, 0, jnp.where(g == me, 1, 2))
                o_p, l_p = jax.lax.switch(
                    case, [partial_full, partial_diag, partial_masked],
                    (qn, k_cur, v_cur))
            else:
                o_p, l_p = partial_full((qn, k_cur, v_cur))
            o_acc = o_acc + o_p
            l_acc = l_acc + l_p
            k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
            v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
            return o_acc, l_acc, k_cur, v_cur

        o0 = jnp.zeros((b, h, n_local, d), jnp.float32)
        l0 = jnp.zeros((b, h, n_local, 1), jnp.float32)
        o_acc, l_acc, _, _ = jax.lax.fori_loop(
            0, size, body, (o0, l0, kn, v))

        return (o_acc / jnp.maximum(l_acc, EPS)).astype(q.dtype)

    f = jax.shard_map(
        inner, mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return f(q, k, v)
