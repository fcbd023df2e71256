"""Head-sharded quantized decode: TP serving of the KV cache over a mesh.

Multi-chip serving layout (north star: head-sharded multi-host serving
with continuous batching): the quantized KV cache shards over the mesh —
batch slots over ``data``, KV heads over ``model`` — and every chip
decodes its local head group against its local cache shard.  Like the
prefill attention (sharded_attention.py), decode needs no collectives
inside the op: heads are embarrassingly parallel (the reference's
blockIdx.z axis, cu:1091-1092); the output projection that follows it in
the transformer block is a row-sharded matmul whose psum GSPMD inserts.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..quant import QuantKVCache
from ..quant.decode_kernel import quantized_decode_attention
from .mesh import DATA_AXIS, MODEL_AXIS


def cache_shardings(mesh: Mesh, kv_heads: int | None = None) -> QuantKVCache:
    """NamedSharding pytree for a QuantKVCache: batch->data, kv-heads->model.

    Grouped-query caches shard their KV heads over ``model`` when the TP
    size divides them (contiguous head blocks keep the local grouped-query
    mapping correct); an MQA cache (1 head) replicates over ``model``
    (every local q head maps to KV head 0).  1 < kv_heads not divisible by
    TP is rejected: replicating would silently remap query groups to the
    wrong KV head inside each shard."""
    tp = mesh.shape[MODEL_AXIS]
    kvh = kv_heads if kv_heads is not None else tp  # default: divisible
    if kvh % tp == 0:
        kv = NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS, None, None))
    elif kvh == 1:
        kv = NamedSharding(mesh, P(DATA_AXIS, None, None, None))
    else:
        raise ValueError(
            f"kv_heads={kvh} must be 1 or a multiple of the TP size "
            f"({tp}) to shard the decode cache: replicating a grouped "
            f"cache would remap query groups to the wrong KV head")
    return QuantKVCache(
        k8=kv, v8=kv, v_scale=kv,
        length=NamedSharding(mesh, P(DATA_AXIS)),
    )


def shard_cache(cache: QuantKVCache, mesh: Mesh) -> QuantKVCache:
    return jax.device_put(
        cache, cache_shardings(mesh, kv_heads=cache.k8.shape[1]))


def head_sharded_decode_attention(
    q: jax.Array,            # (b, h, d) one new token per slot
    cache: QuantKVCache,
    mesh: Mesh,
    scale: float = 8.0,
    groups: int = 1,
    l2norm_qk: bool = True,
    use_kernel: bool = False,
) -> jax.Array:
    """Decode attention with batch sharded over ``data`` and heads/cache
    over ``model``.  Each chip runs the (XLA-fused or Pallas) decode on
    its local shard; no cross-chip communication inside the op."""
    q_spec = P(DATA_AXIS, MODEL_AXIS, None)
    kv_spec = cache_shardings(mesh, kv_heads=cache.k8.shape[1]).k8.spec

    def inner(q, k8, v8, vs, length):
        local = QuantKVCache(k8, v8, vs, length)
        return quantized_decode_attention(
            q, local, scale=scale, groups=groups, l2norm_qk=l2norm_qk,
            use_kernel=use_kernel)

    f = jax.shard_map(
        inner, mesh=mesh,
        in_specs=(q_spec, kv_spec, kv_spec, kv_spec, P(DATA_AXIS)),
        out_specs=q_spec,
        check_vma=False,
    )
    return f(q, cache.k8, cache.v8, cache.v_scale, cache.length)
