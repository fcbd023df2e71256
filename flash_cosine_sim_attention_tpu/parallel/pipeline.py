"""Pipeline parallelism: GPipe-style microbatched stages over a mesh axis.

The reference is single-GPU (SURVEY §2.3: no distributed code of any
kind); this layer is part of the TPU-native scaling story alongside
TP (sharded_attention/train), DP, sequence parallelism (ring_attention),
and the multi-host runtime (distributed).

Design — the standard TPU pipelining recipe (collective-permute over an
ICI ring, compute staggered by stage index):

  * the transformer's ``depth`` layers split into ``S = |pipe|``
    contiguous stages; each stage's per-layer (attention, feed-forward)
    params are STACKED on a leading layer axis and sharded over the
    ``pipe`` mesh axis, so device ``p`` holds exactly its own layers.
    Embedding / final-norm / logits params are replicated (a few hundred
    KB against MBs of layer weights).
  * one training batch splits into ``M`` microbatches.  Inside a
    ``shard_map`` over ``("pipe",)`` the schedule runs
    ``T = M + S - 1`` steps: at step ``t`` device ``p`` processes
    microbatch ``t - p`` (the classic GPipe bubble fills/drains at the
    ends); activations hop ``p -> p+1`` between steps with ONE
    ``lax.ppermute`` per step, riding a single ICI hop.
  * stage 0 embeds its microbatch's tokens; the LAST stage computes the
    shifted-label cross-entropy of each arriving microbatch and
    accumulates the mean loss.
  * the backward needs no bespoke schedule: ``jax.grad`` differentiates
    through the scan + ppermute (a ppermute's transpose is the reverse
    ppermute), reproducing the GPipe backward — bubbles and all — with
    EXACT gradients (pipelining reorders the computation, it does not
    approximate it).  Cotangents of the replicated embed/logits params
    are psum'd across the mesh by shard_map's transpose rule.

Restrictions (asserted): ``pre_norm`` models (the reference's training
recipe, train.py:62), ``depth % S == 0``, ``batch % M == 0``.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.transformer import Attention, FeedForward


def make_pipeline_mesh(n_devices: int, devices=None,
                       pipeline_parallel: int | None = None) -> Mesh:
    """A ("pipe",) mesh — or ("data", "pipe") when ``pipeline_parallel``
    is given and smaller than ``n_devices``: each data-parallel replica
    owns its own pipeline ring, and only the gradient all-reduce crosses
    the data axis (put data on the outer/DCN axis on multi-host)."""
    devices = devices if devices is not None else jax.devices()[:n_devices]
    devices = np.array(devices)
    if pipeline_parallel is None or pipeline_parallel == n_devices:
        return Mesh(devices, ("pipe",))
    assert n_devices % pipeline_parallel == 0, (n_devices, pipeline_parallel)
    return Mesh(devices.reshape(-1, pipeline_parallel), ("data", "pipe"))


def _layer_modules(model):
    """Single-layer (attention, feed-forward) modules matching the
    transformer's own construction (models/transformer.py:179-196)."""
    init_gain = (8 * model.depth) ** -0.25 if not model.pre_norm else 1.0
    attn = Attention(
        dim=model.dim, dim_head=model.dim_head, heads=model.heads,
        kv_heads=model.kv_heads, scale=model.attn_scale,
        l2norm_groups=model.attn_l2norm_groups, pre_norm=model.pre_norm,
        use_fused=model.use_fused,
        non_cosine_sim_attn=model.non_cosine_sim_attn,
        init_gain=init_gain, dtype=model.dtype)
    ff = FeedForward(dim=model.dim, pre_norm=model.pre_norm,
                     init_gain=init_gain, dtype=model.dtype)
    return attn, ff


def split_pipeline_params(model, params, n_stages: int):
    """Regroup a param tree into ``(stacked, aux)``.

    ``stacked`` = {"attn": pytree, "ff": pytree} with leading axes
    ``(n_stages, depth // n_stages)`` on every leaf — shard the first
    over ``pipe``.  ``aux`` holds the embedding / final-norm / logits
    params, replicated.  ``merge_pipeline_params`` inverts exactly.
    """
    assert model.pre_norm, "pipeline stages assume the pre-norm recipe"
    assert model.depth % n_stages == 0, (model.depth, n_stages)
    lp = model.depth // n_stages
    p = params["params"]

    def stack(layers):
        out = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
        return jax.tree.map(
            lambda x: x.reshape(n_stages, lp, *x.shape[1:]), out)

    stacked = {
        "attn": stack([p[f"attn_{i}"] for i in range(model.depth)]),
        "ff": stack([p[f"ff_{i}"] for i in range(model.depth)]),
    }
    aux = {k: v for k, v in p.items()
           if not (k.startswith("attn_") or k.startswith("ff_"))}
    return stacked, {"params": aux}


def merge_pipeline_params(model, stacked, aux):
    """Inverse of ``split_pipeline_params`` (for checkpoints / eval on
    the plain model)."""
    flat = {}
    for name in ("attn", "ff"):
        tree = stacked[name]
        n_stages, per = jax.tree.leaves(tree)[0].shape[:2]
        for s in range(n_stages):
            for j in range(per):
                flat[f"{name}_{s * per + j}"] = jax.tree.map(
                    lambda x, s=s, j=j: x[s, j], tree)
    out = dict(aux["params"])
    out.update(flat)
    return {"params": out}


def make_pipeline_loss_fn(model, mesh: Mesh, n_micro: int,
                          remat: bool = False):
    """Returns ``loss_fn(stacked, aux, tokens)`` over tokens ``(b, n+1)``.

    The scalar equals ``model.apply(merged_params, tokens,
    return_loss=True)`` (GPipe is exact), computed through the pipelined
    schedule over the ``pipe`` mesh axis.  ``remat=True`` checkpoints
    each layer, rematerializing its activations in the backward — the
    standard trade at pipeline scale, where the GPipe backward holds
    ``T = M + S - 1`` steps of residuals.
    """
    S = mesh.shape["pipe"]
    attn_mod, ff_mod = _layer_modules(model)
    res_scale = model.residual_scale  # 1.0 under pre_norm

    def stage_apply(stage_params, h):
        """This device's ``lp`` layers, scanned over the layer axis."""
        def body(h, layer_p):
            h = attn_mod.apply({"params": layer_p["attn"]}, h) \
                + h * res_scale
            h = ff_mod.apply({"params": layer_p["ff"]}, h) + h * res_scale
            return h, None
        if remat:
            body = jax.checkpoint(body)
        h, _ = jax.lax.scan(body, h, stage_params)
        return h

    def embed(aux, x_tokens):
        p = aux["params"]
        tok = p["token_emb"]["embedding"][x_tokens].astype(model.dtype)
        pos = p["pos_emb"]["embedding"][
            jnp.arange(x_tokens.shape[1])].astype(model.dtype)
        return tok + pos[None]

    def head_loss(aux, h, labels):
        p = aux["params"]
        h = nn.LayerNorm(dtype=model.dtype).apply(
            {"params": p["final_norm"]}, h)
        logits = h @ p["to_logits"]["kernel"].astype(model.dtype)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return -jnp.take_along_axis(
            logp, labels[..., None], axis=-1).mean()

    def pipeline_local(stacked_local, aux, tokens):
        """Body run per-device by shard_map (pipe axis stripped to 1)."""
        x, labels = tokens[:, :-1], tokens[:, 1:]
        b, n = x.shape
        mb = b // n_micro
        xm = x.reshape(n_micro, mb, n)
        lm = labels.reshape(n_micro, mb, n)
        p_idx = jax.lax.axis_index("pipe")
        T = n_micro + S - 1
        perm_fwd = [(i, i + 1) for i in range(S - 1)]
        stage_params = jax.tree.map(lambda l: l[0], stacked_local)

        def step(carry, t):
            act, loss_sum = carry
            # activations hop one stage down the ring; the final stage's
            # output is dropped (its loss was already taken)
            recv = (jax.lax.ppermute(act, "pipe", perm_fwd)
                    if S > 1 else act)
            # stage 0 feeds microbatch t (clamped index on bubble steps;
            # the validity mask below discards those results)
            feed = embed(aux, xm[jnp.clip(t, 0, n_micro - 1)])
            h_in = jnp.where(p_idx == 0, feed, recv)
            h_out = stage_apply(stage_params, h_in)
            # the last stage sees microbatch t - (S-1) fully processed
            m = t - (S - 1)
            valid = (p_idx == S - 1) & (m >= 0)
            lmb = lm[jnp.clip(m, 0, n_micro - 1)]
            loss_m = head_loss(aux, h_out, lmb)
            loss_sum = loss_sum + jnp.where(valid, loss_m, 0.0)
            return (h_out, loss_sum), None

        # seed the bubbles with REAL embeddings, not zeros: the l2norm in
        # cosine-sim attention has a NaN derivative at exactly zero, and
        # a single NaN partial poisons the whole param-grad accumulation
        # through 0-cotangent * NaN even though bubble losses are masked
        act0 = embed(aux, xm[0])
        (_, loss_sum), _ = jax.lax.scan(
            step, (act0, jnp.float32(0.0)), jnp.arange(T))
        # (1,): shard_map outputs need a concatenatable leading axis
        return (loss_sum / n_micro)[None]

    has_data = "data" in mesh.axis_names

    def loss_fn(stacked, aux, tokens):
        b = tokens.shape[0]
        d_sz = mesh.shape["data"] if has_data else 1
        assert b % (n_micro * d_sz) == 0, (b, n_micro, d_sz)
        if has_data:
            # each data replica pipelines its own batch shard over its
            # own pipe ring; only the grad all-reduce crosses "data"
            # (P("pipe") replicates over the unmentioned "data" axis)
            per_dev = shard_map(
                lambda s, a, t: pipeline_local(s, a, t)[None],
                mesh=mesh,
                in_specs=(P("pipe"), P(), P("data")),
                out_specs=P("data", "pipe"),
                check_vma=False,
            )(stacked, aux, tokens)
            # pipe: every stage but the last contributed 0; data: mean
            # of per-shard batch means == the global batch mean
            return jnp.mean(jnp.sum(per_dev, axis=1))
        per_dev = shard_map(
            pipeline_local, mesh=mesh,
            in_specs=(P("pipe"), P(), P()),
            out_specs=P("pipe"),
            check_vma=False,  # p_idx-dependent compute breaks rep tracking
        )(stacked, aux, tokens)
        # every stage but the last contributed 0
        return jnp.sum(per_dev)

    return loss_fn


def shard_pipeline_params(stacked, aux, mesh: Mesh):
    """Place the layer stack over the pipe axis; replicate aux."""
    stacked = jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P("pipe", *([None] * (x.ndim - 1))))),
        stacked)
    aux = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), aux)
    return stacked, aux


def make_pipeline_train_step(model, tx, mesh: Mesh, n_micro: int,
                             remat: bool = False):
    """Jitted ``step((stacked, aux), opt_state, tokens) -> (params',
    opt_state', loss)`` with the layer stack sharded over ``pipe``."""
    loss_fn = make_pipeline_loss_fn(model, mesh, n_micro, remat=remat)

    @jax.jit
    def step(params, opt_state, tokens):
        stacked, aux = params
        loss, grads = jax.value_and_grad(
            lambda s, a: loss_fn(s, a, tokens), argnums=(0, 1))(
            stacked, aux)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
