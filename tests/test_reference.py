"""Oracle self-consistency + differential tests against the upstream
PyTorch reference implementation (pure-Python part, imported from
/root/reference when present — no CUDA needed for its einsum path)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_cosine_sim_attention_tpu.ops.reference import (
    grouped_l2norm,
    l2norm,
    l2norm_tensors,
    plain_cosine_sim_attention,
    streaming_cosine_sim_attention,
)

REFERENCE_PATH = "/root/reference"


def rand(rng, *shape, dtype=jnp.float32):
    return jnp.asarray(rng.standard_normal(shape), dtype)


def test_l2norm_unit_norm():
    rng = np.random.default_rng(0)
    t = rand(rng, 4, 16, 64)
    n = jnp.linalg.norm(l2norm(t), axis=-1)
    assert jnp.allclose(n, 1.0, atol=1e-5)


def test_grouped_l2norm_groups_are_unit():
    rng = np.random.default_rng(0)
    t = rand(rng, 4, 16, 64)
    g = grouped_l2norm(t, groups=8).reshape(4, 16, 8, 8)
    n = jnp.linalg.norm(g, axis=-1)
    assert jnp.allclose(n, 1.0, atol=1e-5)
    # whole-vector norm is sqrt(groups)
    n_full = jnp.linalg.norm(grouped_l2norm(t, groups=8), axis=-1)
    assert jnp.allclose(n_full, np.sqrt(8.0), atol=1e-4)


def test_l2norm_tensors_multi():
    rng = np.random.default_rng(0)
    a, b = rand(rng, 2, 8, 32), rand(rng, 2, 8, 32)
    an, bn = l2norm_tensors(a, b, groups=4)
    assert an.dtype == a.dtype and bn.shape == b.shape


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("seq", [63, 128, 257])
def test_plain_vs_streaming(causal, seq):
    rng = np.random.default_rng(42)
    q, k, v = (rand(rng, 2, 4, seq, 64) for _ in range(3))
    a = plain_cosine_sim_attention(q, k, v, causal=causal)
    b = streaming_cosine_sim_attention(q, k, v, causal=causal,
                                       col_tile_size=128)
    assert float(jnp.abs(a - b).max()) < 2e-5


def _torch_reference_available():
    return os.path.isdir(REFERENCE_PATH)


@pytest.mark.skipif(not _torch_reference_available(),
                    reason="upstream reference not mounted")
@pytest.mark.parametrize("causal,mask", [(True, False), (False, True),
                                         (False, False)])
@pytest.mark.parametrize("bias", [False, True])
@pytest.mark.parametrize("single_head_kv", [False, True])
def test_plain_matches_upstream_torch(causal, mask, bias, single_head_kv):
    """Differential test: our pure-JAX oracle vs the upstream repo's
    pure-torch ``plain_cosine_sim_attention`` (its einsum reference path,
    flash_cosine_sim_attention.py:75-126)."""
    import importlib.util

    import torch

    # load the module file directly: the upstream package __init__ re-exports
    # the CUDA extension's `debug`, which doesn't exist in a CPU-only env
    spec = importlib.util.spec_from_file_location(
        "upstream_fcsa",
        os.path.join(REFERENCE_PATH,
                     "flash_cosine_sim_attention",
                     "flash_cosine_sim_attention.py"),
    )
    upstream = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(upstream)
    torch_plain = upstream.plain_cosine_sim_attention

    rng = np.random.default_rng(7)
    b, h, i, j, d = 2, 4, 63, 63, 64
    q = rng.standard_normal((b, h, i, d)).astype(np.float32)
    k_shape = (b, j, d) if single_head_kv else (b, h, j, d)
    k = rng.standard_normal(k_shape).astype(np.float32)
    v = rng.standard_normal(k_shape).astype(np.float32)
    m = (rng.random((b, j)) > 0.3) if mask else None
    ab = (rng.standard_normal((h, i, j)).astype(np.float32) * 0.5
          if bias else None)

    ours = plain_cosine_sim_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        mask=jnp.asarray(m) if m is not None else None,
        attn_bias=jnp.asarray(ab) if ab is not None else None,
        causal=causal,
    )
    theirs = torch_plain(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v),
        mask=torch.from_numpy(m) if m is not None else None,
        attn_bias=torch.from_numpy(ab) if ab is not None else None,
        causal=causal,
    ).numpy()
    assert np.abs(np.asarray(ours) - theirs).max() < 1e-5


def test_streaming_gqa_matches_plain():
    # grouped-query through the streaming (CPU-path) oracle
    rng = np.random.default_rng(21)
    q = jnp.asarray(rng.standard_normal((2, 8, 100, 32)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 2, 100, 32)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 2, 100, 32)), jnp.float32)
    o_s = streaming_cosine_sim_attention(q, k, v, causal=True,
                                         col_tile_size=64)
    o_p = plain_cosine_sim_attention(q, k, v, causal=True)
    assert float(jnp.abs(o_s - o_p).max()) < 1e-5
