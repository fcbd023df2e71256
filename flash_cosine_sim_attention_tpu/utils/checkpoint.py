"""Checkpoint / resume via orbax.

The reference trainer never saves state (SURVEY.md §5: train.py has no
torch.save); this is a new convenience for long TPU runs.  Stores params,
optimizer state, and step count; restores onto the current device layout
(resharding handled by orbax/jax on load).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax


def _manager(ckpt_dir: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True),
    )


def save_checkpoint(ckpt_dir: str, step: int, params: Any,
                    opt_state: Any) -> None:
    import orbax.checkpoint as ocp

    mgr = _manager(ckpt_dir)
    mgr.save(step, args=ocp.args.StandardSave(
        {"params": params, "opt_state": opt_state}))
    mgr.wait_until_finished()
    mgr.close()


def restore_checkpoint(ckpt_dir: str, params: Any, opt_state: Any
                       ) -> Tuple[Optional[int], Any, Any]:
    """Restore the latest checkpoint; (None, params, opt_state) if absent.

    ``params``/``opt_state`` provide the target structure (and shardings,
    if the arrays carry NamedShardings).
    """
    import orbax.checkpoint as ocp

    if not os.path.isdir(ckpt_dir):
        return None, params, opt_state
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    if step is None:
        mgr.close()
        return None, params, opt_state
    target = {"params": params, "opt_state": opt_state}
    restored = mgr.restore(
        step, args=ocp.args.StandardRestore(target))
    mgr.close()
    return step, restored["params"], restored["opt_state"]
