"""Checkpoint save/restore roundtrip."""

import jax
import jax.numpy as jnp
import optax

from flash_cosine_sim_attention_tpu.utils import (
    restore_checkpoint,
    save_checkpoint,
)


def test_roundtrip(tmp_path):
    params = {"w": jnp.arange(8.0), "b": {"x": jnp.ones((2, 2))}}
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    save_checkpoint(str(tmp_path / "ck"), 7, params, opt_state)

    zeros = jax.tree.map(jnp.zeros_like, params)
    z_opt = tx.init(zeros)
    step, p2, o2 = restore_checkpoint(str(tmp_path / "ck"), zeros, z_opt)
    assert step == 7
    assert bool((p2["w"] == params["w"]).all())
    assert bool((p2["b"]["x"] == params["b"]["x"]).all())


def test_restore_missing_dir(tmp_path):
    params = {"w": jnp.ones(3)}
    step, p, o = restore_checkpoint(str(tmp_path / "nope"), params, None)
    assert step is None and p is params
