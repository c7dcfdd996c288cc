"""Orbax-backed checkpointing for model-state pytrees.

The pickle files under the experiment tree stay the *compatibility* format
(the reference's plot pipeline and our resume files read them); Orbax is the
native TPU checkpoint path for large states (SURVEY §5: "the rebuild should
write the same dict shapes ... while using Orbax-style checkpoints
internally"). Both hold the same ``{'params','batch_stats','heads','meta'
[,'method_aux']}`` trees."""

from __future__ import annotations

import os
from typing import Any

from clsurvey_tpu.utils import io


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save(state: Any, path: str) -> str:
    """Write an Orbax checkpoint directory at ``path`` (overwrites)."""
    import shutil

    path = os.path.abspath(path)
    if os.path.isdir(path):
        shutil.rmtree(path)
    _checkpointer().save(path, io.to_host(state))
    return path


def load(path: str) -> Any:
    return _checkpointer().restore(os.path.abspath(path))


def available() -> bool:
    try:
        import orbax.checkpoint  # noqa: F401

        return True
    except ImportError:
        return False
