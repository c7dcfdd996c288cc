"""Streaming vs resident epoch throughput on the real chip.

Times `Engine.train_epoch_chunked` — the host-gathered, double-buffered
uint8-chunk path that replaces the reference's disk-backed DataLoader
streaming (ref:src/methods/rehearsal/main_rehearsal.py:181-184) for
splits above the HBM data budget — against the resident fast path on
identical AlexNet-224 work (the iNaturalist/RecogSeq shape regime), and
against the raw host->device upload alone.

The third number is the point (VERDICT r2 Weak #4): a streaming epoch
can never beat max(upload_time, compute_time); `overlap_efficiency` =
upload_secs / stream_epoch_secs tells how completely the double-buffer
hides the host gather + compute behind the transfer. On this tunneled
dev chip the upload itself is RPC-bound (MB/s recorded below) — a
deployment host feeds HBM over local PCIe at GB/s, so the absolute
img/s here is a tunnel artifact while the efficiency ratio is the
design property.

Run (TPU): python scripts/bench_streaming.py
Writes docs/streaming_bench.json + prints it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_stream", type=int, default=17000,
                    help="rows of the streaming split (17k = 2.44 GB "
                         "> the 2,048 MB budget)")
    ap.add_argument("--n_res", type=int, default=None,
                    help="rows of the resident comparison split (default: "
                         "= --n_stream, an identical-work comparison — "
                         "the 2 GB streaming budget is an eviction "
                         "POLICY, not HBM capacity; 2.44 GB of uint8 "
                         "rows sits resident in 16 GB HBM just fine)")
    ap.add_argument("--batch_size", type=int, default=200)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--out", default="docs/streaming_bench.json")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny_CNN at 32px: CPU sanity mode (the 224px "
                         "AlexNet path is interpret-mode-slow on CPU)")
    a = ap.parse_args(argv)
    if a.n_res is None:
        a.n_res = a.n_stream
    if a.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from clsurvey_tpu.engine.train import (
        Engine, TrainState, data_budget_bytes, make_context,
        tree_zeros_like)
    from clsurvey_tpu.methods.base import UpdateRule
    from clsurvey_tpu.models.registry import ModelSpec, init_model_state

    if a.tiny:
        spec = ModelSpec(
            name="tiny_CNN_cl_32_32", arch="tiny_CNN", input_size=(32, 32),
            classifier_dims=(32, 32),
            models_root_path="/tmp/bench_models",
            compute_dtype=jnp.bfloat16)
        px = 32
    else:
        spec = ModelSpec(
            name="alexnet", arch="alexnet", input_size=(224, 224),
            classifier_dims=(4096, 4096),
            models_root_path="/tmp/bench_models",
            compute_dtype=jnp.bfloat16)
        px = 224
    sd = init_model_state(spec, jax.random.PRNGKey(7), max_tasks=10,
                          classes_per_task=25)
    rule = UpdateRule()
    ctx = make_context(
        spec, task=0, n_tasks=1, class_counts=[25] * 10,
        mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225),
        update_rule=rule, augment=True)
    engine = Engine(ctx)
    tr = {"params": sd["params"],
          "heads": {"kernel": sd["heads"]["kernel"],
                    "bias": sd["heads"]["bias"]}}
    state = TrainState(tr, {}, tree_zeros_like(tr),
                       rule.init_state(tr, {}, ctx))

    rng = np.random.default_rng(3)
    imgs_np = rng.integers(0, 255, (a.n_stream, px, px, 3),
                           dtype=np.uint8)
    lbls_np = rng.integers(0, 25, (a.n_stream,), dtype=np.int32)
    row_bytes = imgs_np.nbytes // a.n_stream
    budget = data_budget_bytes()
    assert imgs_np.nbytes > budget, "streaming split must exceed budget"
    chunk_rows = max(budget // 2 // row_bytes, 1)  # train_task's policy
    key = jax.random.PRNGKey(11)

    def hbm_peak():
        """Device-memory peak (the TPU analog of the reference's pickled
        CUDA memory requirement, ref:src/utilities/utils.py:85-97). Scans
        the stats dict for a peak-style key; falls back to the current
        bytes-in-use when the backend reports no peak counter."""
        try:
            ms = jax.local_devices()[0].memory_stats() or {}
        except Exception:
            return None
        for k in ("peak_bytes_in_use", "peak_pool_bytes", "peak_bytes"):
            if ms.get(k):
                return int(ms[k])
        for k, v in sorted(ms.items()):
            if "peak" in k and isinstance(v, (int, float)) and v:
                return int(v)
        if ms.get("bytes_in_use"):
            return int(ms["bytes_in_use"])
        return None

    # raw upload bandwidth: a budget-half chunk, contiguous; min of
    # several timed uploads (a single sample is noisy on an RPC tunnel),
    # with the final partial chunk weighted by its actual row count
    chunk = np.ascontiguousarray(imgs_np[:chunk_rows])
    dev = jax.device_put(chunk)
    jax.block_until_ready(dev)  # warm the path
    uploads = []
    for i in range(4):
        t0 = time.perf_counter()
        dev = jax.device_put(chunk)
        jax.block_until_ready(dev)
        uploads.append(time.perf_counter() - t0)
        # progress lines keep the queue watchdog's frozen-log check fed
        print(f"upload probe {i}: {uploads[-1]:.1f}s", flush=True)
    upload_secs_chunk = min(uploads)
    del dev
    upload_mbps = chunk.nbytes / 2 ** 20 / upload_secs_chunk
    full_chunks, last_rows = divmod(a.n_stream, chunk_rows)
    upload_secs_epoch = upload_secs_chunk * (
        full_chunks + last_rows / chunk_rows)

    # streaming epochs (first = compile warmup, not timed)
    def stream_epoch(e):
        ekey = jax.random.fold_in(key, e)
        perm = np.asarray(jax.random.permutation(ekey, a.n_stream))
        t0 = time.perf_counter()
        st, m = engine.train_epoch_chunked(
            stream_epoch.state, imgs_np, lbls_np, perm, ekey, 5e-3,
            a.batch_size, chunk_rows)
        _ = float(m["loss"])  # forced host sync (CLAUDE.md timing rule)
        stream_epoch.state = st
        return time.perf_counter() - t0

    stream_epoch.state = state
    t = stream_epoch(0)
    print(f"stream warmup epoch: {t:.1f}s", flush=True)
    stream_times = []
    for e in range(a.epochs):
        stream_times.append(stream_epoch(e + 1))
        print(f"stream epoch {e}: {stream_times[-1]:.1f}s", flush=True)
    stream_secs = min(stream_times)
    stream_hbm_peak = hbm_peak()

    # resident comparison: same step, split fits in HBM
    print("uploading resident split...", flush=True)
    res_imgs = jnp.asarray(imgs_np[: a.n_res])
    res_lbls = jnp.asarray(lbls_np[: a.n_res])
    jax.block_until_ready(res_imgs)
    print("resident split uploaded", flush=True)

    def res_epoch(e):
        ekey = jax.random.fold_in(key, 100 + e)
        perm = jax.random.permutation(ekey, a.n_res)
        t0 = time.perf_counter()
        st, m = engine.train_epoch(res_epoch.state, res_imgs, res_lbls,
                                   perm, ekey, 5e-3, a.batch_size)
        _ = float(m["loss"])
        res_epoch.state = st
        return time.perf_counter() - t0

    res_epoch.state = stream_epoch.state
    t = res_epoch(0)
    print(f"resident warmup epoch: {t:.1f}s", flush=True)
    res_times = []
    for e in range(a.epochs):
        res_times.append(res_epoch(e + 1))
        print(f"resident epoch {e}: {res_times[-1]:.1f}s", flush=True)
    res_secs = min(res_times)

    result = {
        "stream_rows": a.n_stream,
        "stream_bytes": int(imgs_np.nbytes),
        "budget_bytes": int(budget),
        "chunk_rows": int(chunk_rows),
        "upload_mbps_tunnel": round(upload_mbps, 1),
        "upload_secs_per_epoch": round(upload_secs_epoch, 2),
        "stream_epoch_secs": round(stream_secs, 2),
        "stream_imgs_per_sec": round(a.n_stream / stream_secs, 1),
        "overlap_efficiency": round(upload_secs_epoch / stream_secs, 3),
        "stream_hbm_peak_bytes": stream_hbm_peak,
        "resident_rows": a.n_res,
        "resident_epoch_secs": round(res_secs, 2),
        "resident_imgs_per_sec": round(a.n_res / res_secs, 1),
        "resident_hbm_peak_bytes": hbm_peak(),
        "note": "overlap_efficiency ~1.0 = gather+compute fully hidden "
                "behind the transfer; absolute stream img/s is "
                "tunnel-bandwidth-bound on this dev host; stream and "
                "resident legs train the SAME row count by default "
                "(identical work)",
    }
    os.makedirs(os.path.dirname(a.out) or ".", exist_ok=True)
    with open(a.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
