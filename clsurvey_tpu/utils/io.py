"""Checkpoint / result-dict IO.

The reference serialises everything with ``torch.save`` pickles
(ref:SURVEY §5): whole-model pickles ``best_model.pth.tar``, epoch dicts,
framework-state dicts, and eval result dicts
``{eval_name: {seq_res, seq_forgetting, seq_head_acc}}``
(ref:src/framework/eval.py:176-185). We keep the same filenames and dict
shapes but write torch-free pickles of plain-python / numpy objects, so the
reference's plotting pipeline (which only reads dicts of lists/floats for
results) keeps working, and our checkpoints carry JAX pytrees as numpy
arrays. Writes are atomic (tmp + rename) so resume files are never torn."""

from __future__ import annotations

import os
import pickle
import tempfile
from typing import Any

import jax
import numpy as np


def to_host(tree: Any) -> Any:
    """Device pytree -> numpy pytree (safe to pickle, device-independent)."""
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if isinstance(x, (jax.Array, np.ndarray)) else x,
        tree,
    )


def _atomic_write(path: str, writer) -> str:
    """Write via mkstemp + os.replace so readers never see a torn file."""
    directory = os.path.dirname(os.path.abspath(path))
    os.makedirs(directory, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=directory, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            writer(f)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return path


def save(obj: Any, path: str) -> str:
    obj = to_host(obj)
    return _atomic_write(path, lambda f: pickle.dump(
        obj, f, protocol=pickle.HIGHEST_PROTOCOL))


def save_compat(obj: Any, path: str) -> str:
    """Write a reference-pipeline-compatible artifact: ``torch.save``
    format when torch is importable (the reference's postprocessing loads
    these with ``torch.load``, which cannot read plain pickles), plain
    pickle otherwise. Use for eval result dicts and hyperparams.pth.tar
    (ref:src/framework/eval.py:176-185, framework_train.py:58-64)."""
    try:
        import torch
    except ImportError:
        return save(obj, path)
    obj = to_host(obj)
    return _atomic_write(path, lambda f: torch.save(obj, f))


def load(path: str) -> Any:
    with open(path, "rb") as f:
        head = f.read(4)
        f.seek(0)
        if head[:2] == b"PK":  # torch.save zip container
            import torch

            return torch.load(f, map_location="cpu", weights_only=False)
        return pickle.load(f)


def exists(path: str) -> bool:
    return os.path.isfile(path)
