"""Checkpoint / resume for training state (orbax).

The reference has no computation checkpointing at all (SURVEY §5: 'absent';
its only resume is the GA's CSV memo).  Real training needs it: save the
TrainState pytree (params + optimiser state + step) and restore to continue
— multi-host safe (orbax coordinates across processes).
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def _mgr(path: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp
    return ocp.CheckpointManager(
        os.path.abspath(path),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
    )


def save_state(path: str, state, step: Optional[int] = None) -> int:
    """Save a TrainState (or any pytree).  Returns the step saved."""
    import orbax.checkpoint as ocp
    mgr = _mgr(path)
    s = int(step if step is not None else jax.device_get(state.step))
    mgr.save(s, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()
    return s


def restore_state(path: str, template, step: Optional[int] = None):
    """Restore into the structure of ``template`` (e.g. a freshly built
    TrainState).  ``step=None`` restores the latest."""
    import orbax.checkpoint as ocp
    mgr = _mgr(path)
    s = step if step is not None else mgr.latest_step()
    if s is None:
        mgr.close()
        raise FileNotFoundError(f"no checkpoint under {path}")
    out = mgr.restore(s, args=ocp.args.StandardRestore(template))
    mgr.close()
    return out


def latest_step(path: str) -> Optional[int]:
    import orbax.checkpoint as ocp
    if not os.path.isdir(path):
        return None
    mgr = _mgr(path)
    s = mgr.latest_step()
    mgr.close()
    return s
