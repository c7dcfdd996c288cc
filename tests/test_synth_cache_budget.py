"""Bounded in-memory synthetic task cache (data/synthetic.py).

Unbounded caching OOM-killed the r4 RecogSeq-scale run (8 x 224px tasks
> 100 GB of uint8 host arrays). The cache must evict oldest tasks over
the byte budget while regeneration stays deterministic in
(name, seed, task).
"""

import numpy as np

from clsurvey_tpu.data import registry


def test_eviction_keeps_newest_and_regen_is_deterministic(monkeypatch):
    ds = registry.parse("synthetic_3t_4c_32px_80n")
    monkeypatch.setattr(type(ds), "_MEM_BUDGET_BYTES", 2 ** 20)
    for t in (1, 2, 3):
        ds.get_task_dataset(t)
    assert sorted(ds._cache) == [3]  # each task > 1 MiB: only newest stays
    a = ds.get_task_dataset(1).train.images  # evicts 3, regenerates 1
    b = ds.get_task_dataset(1).train.images  # cached: same object path
    np.testing.assert_array_equal(a, b)


def test_default_budget_keeps_small_tasks():
    ds = registry.parse("synthetic_3t_4c_32px_80n")
    for t in (1, 2, 3):
        ds.get_task_dataset(t)
    assert sorted(ds._cache) == [1, 2, 3]
