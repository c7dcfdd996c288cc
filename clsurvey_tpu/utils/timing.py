"""Phase timing + device memory telemetry.

The reference prints per-task phase timers (phase1 / presteps /
convergence_iteration / postprocess, ref:src/framework/framework_train.py:
237-240,286-292; ref:src/utilities/utils.py:100-110) and pickles CUDA memory
stats next to each best model (ref:src/utilities/utils.py:85-97). TPU
equivalent: wall-clock timers plus ``device.memory_stats()`` HBM numbers."""

from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Any

import jax

from clsurvey_tpu.utils import io

MEM_FILENAME = "mem_req.pth.tar"  # reference: cuda_mem_req.pth.tar
PREPROCESS_TIME_FILENAME = "preprocess_time.pth.tar"


class PhaseTimer:
    """Accumulates named phase durations; printable like the reference."""

    def __init__(self):
        self.elapsed: dict[str, float] = {}

    @contextmanager
    def phase(self, name: str):
        start = time.perf_counter()
        try:
            yield
        finally:
            self.elapsed[name] = self.elapsed.get(name, 0.0) + (
                time.perf_counter() - start
            )

    def print_timing(self, prefix: str = "") -> None:
        # ref:src/utilities/utils.py:108-110
        for name, secs in self.elapsed.items():
            print(f"{prefix}{name} elapsed_time = {secs:.2f}s")


def device_memory_stats() -> dict[str, Any]:
    """Per-device HBM stats (reference saved cuda_memory_allocated/cached)."""
    stats = {}
    for dev in jax.local_devices():
        mem = dev.memory_stats() or {}
        stats[str(dev)] = {
            "bytes_in_use": mem.get("bytes_in_use", 0),
            "peak_bytes_in_use": mem.get("peak_bytes_in_use", 0),
            "bytes_limit": mem.get("bytes_limit", 0),
        }
    return stats


def save_mem_req(exp_dir: str) -> None:
    """ref:src/utilities/utils.py:85-97 — pickle memory stats next to model."""
    io.save(device_memory_stats(), f"{exp_dir}/{MEM_FILENAME}")


def save_preprocessing_time(exp_dir: str, seconds: float) -> None:
    """ref:src/utilities/utils.py:100-105."""
    io.save({"preprocess_time": seconds}, f"{exp_dir}/{PREPROCESS_TIME_FILENAME}")


def host_rss_gib() -> float:
    """Process anon RSS in GiB (no psutil in the image — /proc direct).
    Diagnostic for host-side buffer accumulation: the r4 RecogSeq-scale
    run was OOM-killed at 130 GB RSS after four 224px tasks."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 2**20
    except OSError:
        pass
    return float("nan")


def print_stats() -> None:
    """Max-memory summary at run end (ref:src/utilities/utils.py:113-124)."""
    for dev, mem in device_memory_stats().items():
        peak_gb = mem["peak_bytes_in_use"] / 2**30
        print(f"{dev}: peak HBM {peak_gb:.3f} GiB")
    print(f"host RSS {host_rss_gib():.2f} GiB")
