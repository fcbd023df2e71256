"""checkify wrapper + differential debug report."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_cosine_sim_attention_tpu.utils import (
    checkify_attention,
    debug_attention,
)


def _inputs():
    rng = np.random.default_rng(0)
    return tuple(jnp.asarray(rng.standard_normal((1, 2, 64, 64)),
                             jnp.float32) for _ in range(3))


def test_checkify_clean_inputs_pass():
    q, k, v = _inputs()
    checked = checkify_attention(causal=True)
    err, out = checked(q, k, v)
    err.throw()  # no error expected
    assert out.shape == q.shape


def test_checkify_catches_nan():
    q, k, v = _inputs()
    v = v.at[0, 0, 3, :].set(jnp.nan)
    checked = checkify_attention(causal=True)
    err, _ = checked(q, k, v)
    with pytest.raises(Exception, match="non-finite"):
        err.throw()


def test_debug_report():
    q, k, v = _inputs()
    rep = debug_attention(q, k, v, causal=True)
    assert rep["fused_finite"] and rep["oracle_finite"]
    assert rep["max_abs_diff"] < 1e-4
    assert rep["shape"] == (1, 2, 64, 64)


def test_benchmark_utility_smoke():
    """Slope-timing harness returns sane values on CPU and passes all
    operands as jit args (no constant capture)."""
    from flash_cosine_sim_attention_tpu.utils import benchmark

    x = jnp.ones((128, 128), jnp.float32)
    w = jnp.ones((128, 128), jnp.float32)
    t_fwd = benchmark(lambda x, w: x @ w, x, w, forwards=True, num_times=4)
    assert t_fwd >= 0.0
    t_fb = benchmark(lambda x, w: x @ w, x, w, forwards=True,
                     backwards=True, num_times=4, grad_argnums=(0,))
    assert t_fb >= 0.0
