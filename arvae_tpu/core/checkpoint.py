"""Checkpointing (orbax) with reference-compatible naming.

The reference saves weights-only every epoch to
``models/<repr>/<repr>.pt`` (overwriting) and never persists optimizer
state (``utils/model.py:43-88`` — resume is impossible there). Here a
checkpoint is the full ``(params, opt_state, step, epoch)`` tree via
orbax, so training *can* resume (SURVEY.md §5.4 gap, fixed), while the
directory naming keeps the reference's identity semantics.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class Checkpointer:
    """Save/restore full train state under models/<repr>/ckpt."""

    def __init__(self, run_dir: str):
        self.run_dir = os.path.abspath(run_dir)
        self.path = os.path.join(self.run_dir, "ckpt")
        self._ckptr = ocp.StandardCheckpointer()

    def save(self, state: Any, force: bool = True) -> None:
        os.makedirs(self.run_dir, exist_ok=True)
        # fully materialize on host before writing
        state = jax.tree_util.tree_map(np.asarray, jax.device_get(state))
        self._ckptr.save(self.path, state, force=force)
        self._ckptr.wait_until_finished()

    def exists(self) -> bool:
        return os.path.isdir(self.path)

    def restore(self, template: Optional[Any] = None) -> Any:
        if template is not None:
            template = jax.tree_util.tree_map(np.asarray, jax.device_get(template))
        try:
            restored = self._ckptr.restore(self.path, template)
        except Exception:
            if template is None or not hasattr(template, "hyper") \
                    or template.hyper is None:
                raise
            # Checkpoints written before TrainState grew the `hyper`
            # field restore against a hyper-less template; the caller's
            # template values (derived from the trainer's hparams) fill
            # the gap. If this fallback fails too, the implicit chain
            # surfaces the original structure-mismatch error alongside.
            old = template.replace(hyper=None)
            restored = self._ckptr.restore(self.path, old)
            return restored.replace(hyper=template.hyper)
        # Hyper precedence is the same on both restore paths: the
        # trainer's current hparams win over whatever is on disk (run
        # dirs already encode the config, so a differing on-disk hyper
        # means the user changed hparams between runs).
        if (
            template is not None
            and getattr(template, "hyper", None) is not None
            and getattr(restored, "hyper", None) is not None
        ):
            restored = restored.replace(hyper=template.hyper)
        return restored
