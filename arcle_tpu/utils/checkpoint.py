"""Checkpoint / resume via orbax.

The reference checkpoints through RLlib's ``algo.save`` every N epochs
(train.py:153-154) plus ad-hoc pickles of successful batches
(train.py:126-128).  Here: the whole training state pytree (params, opt
state, env batch state, RNG keys, iteration counter) is one orbax
checkpoint — env state included, since the batched pytree is trivially
serializable (SURVEY.md §5)."""

from __future__ import annotations

import os
from typing import Any, Optional


def _manager(directory: str, max_to_keep: int = 5):
    import orbax.checkpoint as ocp
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    return ocp.CheckpointManager(
        directory,
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep))


class Checkpointer:
    """Thin orbax wrapper: ``save(step, tree)`` / ``restore(template)``."""

    def __init__(self, directory: str, max_to_keep: int = 5):
        self.dir = directory
        self._mgr = _manager(directory, max_to_keep)

    def save(self, step: int, tree: Any) -> None:
        import orbax.checkpoint as ocp
        self._mgr.save(step, args=ocp.args.StandardSave(tree))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, template: Any, step: Optional[int] = None) -> Any:
        import orbax.checkpoint as ocp
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(step,
                                 args=ocp.args.StandardRestore(template))
