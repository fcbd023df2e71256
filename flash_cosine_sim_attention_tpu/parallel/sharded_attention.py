"""Head-sharded fused attention via shard_map.

The reference's CUDA grid treats heads as an embarrassingly-parallel block
axis (blockIdx.z, cu:1091-1092); on a TPU mesh the same axis becomes a
``model`` mesh dimension: each chip runs the Pallas kernel on its local
head shard, no collectives inside attention.  Batch shards over ``data``.

Single-headed KV under a head-sharded mesh keeps K/V replicated on the
model axis (every chip needs the full KV), which is exactly the PaLM
serving layout.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import flash_cosine_sim_attention
from .mesh import DATA_AXIS, MODEL_AXIS


def head_sharded_flash_attention(
    q: jax.Array,   # (b, h, n, d)
    k: jax.Array,   # (b, kvh, n, d) with kvh | h, or (b, n, d) single-head
    v: jax.Array,
    mesh: Mesh,
    mask: Optional[jax.Array] = None,
    **kwargs,
) -> jax.Array:
    """flash_cosine_sim_attention sharded (batch -> data, heads -> model).

    Grouped-query KV heads shard over ``model`` when divisible by the TP
    size (contiguous head blocks keep the kernel's local ``hi // q_per_kv``
    mapping globally correct).  Otherwise KV is repeated to the full head
    count BEFORE sharding: replicating 1 < kvh < h KV heads while q is
    head-sharded would silently remap query groups to the wrong KV head
    inside the shard (each chip's kernel recomputes q_per_kv from LOCAL
    head counts), and per-chip KV bytes of repeat-then-shard (h/tp heads)
    never exceed replication's (kvh heads) when kvh % tp != 0."""
    single_head_kv = k.ndim == 3
    tp = mesh.shape[MODEL_AXIS]
    q_spec = P(DATA_AXIS, MODEL_AXIS, None, None)
    if single_head_kv:
        # kernel maps every local q head to KV head 0: replicate
        kv_spec = P(DATA_AXIS, None, None)
    else:
        kvh, h = k.shape[1], q.shape[1]
        if kvh == h or kvh % tp == 0:
            kv_spec = q_spec
        elif kvh == 1:
            kv_spec = P(DATA_AXIS, None, None, None)  # MQA: replicate
        else:
            k = jnp.repeat(k, h // kvh, axis=1)
            v = jnp.repeat(v, h // kvh, axis=1)
            kv_spec = q_spec
    mask_spec = P(DATA_AXIS, None)

    if mask is not None:
        def inner(q, k, v, mask):
            return flash_cosine_sim_attention(q, k, v, mask=mask, **kwargs)
        f = jax.shard_map(
            inner, mesh=mesh,
            in_specs=(q_spec, kv_spec, kv_spec, mask_spec),
            out_specs=q_spec,
            check_vma=False,  # pallas_call carries no vma metadata
        )
        return f(q, k, v, mask)

    def inner(q, k, v):
        return flash_cosine_sim_attention(q, k, v, **kwargs)
    f = jax.shard_map(
        inner, mesh=mesh,
        in_specs=(q_spec, kv_spec, kv_spec),
        out_specs=q_spec,
        check_vma=False,  # pallas_call carries no vma metadata
    )
    return f(q, k, v)
