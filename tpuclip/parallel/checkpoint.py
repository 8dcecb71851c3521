"""Training-state checkpoint/resume (orbax-backed).

The reference's fault-tolerance story is DB-as-checkpoint for the *index*
(SURVEY.md §5); the training subsystem gets the standard JAX story: orbax
PyTree checkpoints of the full TrainState (params + optimizer moments +
step), restoring onto whatever mesh/sharding the caller provides.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax

from tpuclip.parallel.training import TrainState


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_train_state(directory: str, state: TrainState) -> None:
    path = Path(directory).resolve()
    path.parent.mkdir(parents=True, exist_ok=True)
    ckpt = _checkpointer()
    ckpt.save(str(path), jax.tree.map(lambda x: x, state), force=True)


def restore_train_state(
    directory: str, template: Optional[TrainState] = None
) -> Any:
    """Restore a TrainState. With ``template`` (an abstract or concrete state
    with the desired shardings), arrays restore directly onto those devices."""
    import orbax.checkpoint as ocp

    ckpt = _checkpointer()
    path = str(Path(directory).resolve())
    if template is not None:
        restored = ckpt.restore(path, item=template)
    else:
        restored = ckpt.restore(path)
    if isinstance(restored, TrainState):
        return restored
    # orbax returns plain containers; rebuild the NamedTuple
    if isinstance(restored, dict):
        return TrainState(
            params=restored["params"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )
    return TrainState(*restored)
