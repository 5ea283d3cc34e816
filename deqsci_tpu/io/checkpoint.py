"""Native checkpointing (orbax) with the reference's resume semantics.

The reference persists ``{'solver_state_dict', 'epoch', 'optimizer_state_dict',
'scheduler_state_dict'}`` and on resume restores weights + epoch but
deliberately not the optimizer (video_sci_proxgrad.py:216-225). Here the
full snapshot is saved and ``restore(..., with_optimizer=False)`` reproduces
the reference default.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def path(self, tag: str) -> str:
        return os.path.join(self.directory, tag)

    def save(self, tag: str, snapshot: Dict[str, Any]) -> None:
        """snapshot = {'params', 'opt_state', 'epoch'} (numpy pytrees)."""
        path = self.path(tag)
        self._ckptr.save(path, snapshot, force=True)
        self._ckptr.wait_until_finished()

    def restore(self, tag: str,
                template: Optional[Dict[str, Any]] = None,
                with_optimizer: bool = True) -> Dict[str, Any]:
        path = self.path(tag)
        if template is not None:
            out = self._ckptr.restore(path, template)
        else:
            out = self._ckptr.restore(path)
        if not with_optimizer:
            out = dict(out)
            out.pop("opt_state", None)
        return out

    def exists(self, tag: str) -> bool:
        return os.path.isdir(self.path(tag))
