"""Fused 2x2/2 max-pool with an argmax-routed VJP, as Pallas TPU kernels.

Why: XLA lowers the max-pool VJP to one select-and-scatter per pool —
the single largest line item of the flagship small_VGG9 step
(docs/PERF.md: 0.65 ms of a ~3.0 ms step, plus 0.18 ms pool0 forward).
This kernel pair stores an argmax code per output cell in the forward
and routes the cotangent directly in the backward — no
select-and-scatter, no 6-D window-broadcast materializations (the two
approaches already measured and rejected in docs/PERF.md).

Adoption is gated OFF by default (``CLSURVEY_PALLAS_POOL=1``), and the
r3 decision bench measured the kernel as a 1.64x end-to-end LOSS
(``scripts/bench_pool.py`` on the real chip: 3.46 -> 5.67 ms/batch):
the argmax side-output doubles the pool's HBM traffic while XLA's
select-and-scatter recomputes window compares and fuses into the conv
epilogue. The pair stays in-tree as a working, exactly-parity-pinned
Mosaic reference (PROBE PASS on all stage/dtype combos; see
docs/PERF.md "Decided (r3)" for the four lowering constraints it
documents).

Layout strategy (Mosaic-constrained — the first version of this kernel
used in-kernel reshapes that collapse sublane/lane dims, which Mosaic's
``infer-vector-layout`` rejects as an "unsupported shape cast"; see
docs/PERF.md):

- The NHWC array is viewed OUTSIDE the kernel (free row-major bitcast)
  as 4-D ``(B*H/2, 2, Wo, 2C)``: dim 1 separates the two image rows of
  a window-row pair, and the two horizontally-adjacent pixels of each
  window sit in the two C-halves of the 2C minor dim.
- Inside the kernel the ONLY operations are leading-dim indexing
  (``x[:, 0]`` / ``x[:, 1]`` — vertical pair), minor-dim lane rotates
  by C (``pltpu.roll`` — horizontal pair), and elementwise select/max.
  No reshapes, no sub-tile slices, no strided slices.
- Every mask is produced by comparing vectors of the INPUT dtype
  (including float iota lane indices and float argmax codes), so the
  i1 mask layout always matches its consumers — mixing mask bitwidths
  was the second Mosaic failure mode ("Invalid relayout" on i1).
- Outputs carry valid data in the first C lanes of each 2C group; the
  wrapper compacts with an XLA slice (fusible into the consumer).

Tie-break parity: the argmax picks the FIRST maximum in window
row-major order — identical to XLA select-and-scatter's GE-select
semantics — so switching kernels cannot change training trajectories
even on ties (bf16 activations tie often).

Reference behavior replaced: ``nn.max_pool(x, (2, 2), strides=(2, 2))``
in VGG feature stacks (ref:src/models/VGGSlim.py:30-40 uses
torch MaxPool2d(2, 2) whose CUDA backward is argmax-routed — this is
the TPU equivalent of that CUDA kernel).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_rows_block(rows: int, row_bytes: int,
                     budget: int = 4 * 1024 * 1024) -> int | None:
    """Largest divisor of ``rows`` that fits the VMEM budget and keeps
    sublane-aligned (multiple of 8, or == rows)."""
    cap = max(1, budget // max(row_bytes, 1))
    for d in range(min(rows, cap), 0, -1):
        if rows % d == 0 and (d % 8 == 0 or d == rows):
            return d
    return None


def _roll_c(x, c):
    """Swap the two C-halves of the 2C minor dim (axis 2 of a 3-D
    vector). On an axis of size exactly 2C, roll(+C) == roll(-C), so one
    non-negative rotate serves both pairing directions (pltpu.roll
    rejects negative shifts)."""
    return pltpu.roll(x, c, 2)


def _fwd_kernel(c: int, x_ref, val_ref, idx_ref):
    # Mosaic's tpu.dynamic_rotate only supports 32-bit data ("Rotate with
    # non-32-bit data" on bf16, probed on the live chip) — compute in f32
    # and cast back at store. bf16->f32 is exact and order-preserving, so
    # max/tie-break semantics are bit-identical to native-bf16 compares.
    top = x_ref[:, 0].astype(jnp.float32)   # (rb, wo, 2c): [a | b]
    bot = x_ref[:, 1].astype(jnp.float32)   # (rb, wo, 2c): [d | e]
    # lanes [0:c) hold the window pair-compare; [c:2c) is wrap garbage
    rtop = _roll_c(top, c)
    rbot = _roll_c(bot, c)
    one = jnp.ones_like(top)
    t_ge = top >= rtop                      # a >= b (first-max tie-break)
    val_t = jnp.where(t_ge, top, rtop)
    idx_t = jnp.where(t_ge, one * 0, one)   # codes 0 / 1
    b_ge = bot >= rbot                      # d >= e
    val_b = jnp.where(b_ge, bot, rbot)
    idx_b = jnp.where(b_ge, one * 2, one * 3)
    f_ge = val_t >= val_b                   # top row wins ties
    val = jnp.where(f_ge, val_t, val_b)
    idx = jnp.where(f_ge, idx_t, idx_b)
    # duplicate the valid [0:c) argmax codes into [c:2c) so the backward
    # kernel can select both halves with one dtype-homogeneous compare
    # Mosaic's tpu.iota only produces integer/index vectors: generate the
    # lane index as int32 and convert to the compute dtype (a direct
    # float iota fails lowering on real TPU — advisor-verified).
    lane = jax.lax.broadcasted_iota(jnp.int32, top.shape, 2).astype(top.dtype)
    in_lo = lane < one * c
    val_ref[...] = val.astype(val_ref.dtype)
    idx_ref[...] = jnp.where(in_lo, idx, _roll_c(idx, c)).astype(idx_ref.dtype)


def _bwd_kernel(c: int, gg_ref, idx_ref, dx_ref):
    # All compute in f32: bf16 arith.cmpf -> i1 fails Mosaic relayout on
    # the live chip (same class as the fwd rotate constraint); bf16->f32
    # is exact so the select semantics are unchanged.
    gg = gg_ref[...].astype(jnp.float32)   # (rb, wo, 2c): dup cotangent
    idx = idx_ref[...].astype(jnp.float32)
    one = jnp.ones_like(gg)
    # int32 iota + convert: see _fwd_kernel (tpu.iota integer constraint)
    lane = jax.lax.broadcasted_iota(jnp.int32, gg.shape, 2).astype(gg.dtype)
    # lane slot [0:c) receives the cotangent iff idx picked the left
    # pixel (codes 0 / 2); [c:2c) iff the right pixel (codes 1 / 3)
    want_top = jnp.where(lane < one * c, one * 0, one)
    zero = jnp.zeros_like(gg)
    dx_ref[:, 0] = jnp.where(idx == want_top, gg, zero).astype(dx_ref.dtype)
    dx_ref[:, 1] = jnp.where(idx == want_top + 2, gg,
                             zero).astype(dx_ref.dtype)


def supported(shape, dtype=None) -> bool:
    """Kernel preconditions: 4-D NHWC, even H and W, C a multiple of 64
    (so the 2C window-pair minor dim is lane-tile aligned) and C <= 128
    (lane iota codes must stay exactly representable in bf16)."""
    if len(shape) != 4:
        return False
    b, h, w, c = shape
    return (h % 2 == 0 and w % 2 == 0 and h >= 2 and w >= 2
            and c % 64 == 0 and 0 < c <= 128)


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _fwd_pair(x):
    b, h, w, c = x.shape
    rows, wo = b * (h // 2), w // 2
    x4 = x.reshape(rows, 2, wo, 2 * c)      # free row-major bitcast
    bpe = 3 * jnp.dtype(x.dtype).itemsize + jnp.dtype(x.dtype).itemsize
    rb = _pick_rows_block(rows, 2 * w * c * bpe)
    if rb is None:  # pathological row count: single-row blocks
        rb = 1
    val_w, idx_w = pl.pallas_call(
        functools.partial(_fwd_kernel, c),
        interpret=_interpret(),
        grid=(rows // rb,),
        out_shape=(
            jax.ShapeDtypeStruct((rows, wo, 2 * c), x.dtype),
            jax.ShapeDtypeStruct((rows, wo, 2 * c), x.dtype),
        ),
        in_specs=[pl.BlockSpec((rb, 2, wo, 2 * c), lambda i: (i, 0, 0, 0))],
        out_specs=(
            pl.BlockSpec((rb, wo, 2 * c), lambda i: (i, 0, 0)),
            pl.BlockSpec((rb, wo, 2 * c), lambda i: (i, 0, 0)),
        ),
    )(x4)
    # compact the valid first C lanes of each window group (XLA slice —
    # fusible into the consumer)
    out = val_w[:, :, :c].reshape(b, h // 2, wo, c)
    return out, idx_w


def _bwd_dx(g, idx_w, x_shape):
    b, h, w, c = x_shape
    rows, wo = b * (h // 2), w // 2
    g3 = g.astype(idx_w.dtype).reshape(rows, wo, c)
    gg = jnp.concatenate([g3, g3], axis=-1)  # duplicate into both halves
    bpe = 4 * jnp.dtype(gg.dtype).itemsize
    rb = _pick_rows_block(rows, 2 * w * c * bpe)
    if rb is None:
        rb = 1
    dx4 = pl.pallas_call(
        functools.partial(_bwd_kernel, c),
        interpret=_interpret(),
        grid=(rows // rb,),
        out_shape=jax.ShapeDtypeStruct((rows, 2, wo, 2 * c), gg.dtype),
        in_specs=[
            pl.BlockSpec((rb, wo, 2 * c), lambda i: (i, 0, 0)),
            pl.BlockSpec((rb, wo, 2 * c), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((rb, 2, wo, 2 * c), lambda i: (i, 0, 0, 0)),
    )(gg, idx_w)
    return dx4.reshape(b, h, w, c).astype(g.dtype)


@jax.custom_vjp
def maxpool2x2(x):
    """2x2 stride-2 max pool (NHWC, even H/W) with argmax-routed VJP."""
    return _fwd_pair(x)[0]


def _vjp_fwd(x):
    out, idx_w = _fwd_pair(x)
    return out, (idx_w, x.shape)


def _vjp_bwd(res, g):
    idx_w, x_shape = res
    return (_bwd_dx(g, idx_w, x_shape),)


maxpool2x2.defvjp(_vjp_fwd, _vjp_bwd)


def use_pallas_pool() -> bool:
    env = os.environ.get("CLSURVEY_PALLAS_POOL")
    return env is not None and env.strip().lower() not in (
        "0", "false", "no", "off", "")


def pool2x2(x):
    """Gated dispatch for model code: the fused Pallas kernel when
    ``CLSURVEY_PALLAS_POOL=1`` and the shape qualifies, else XLA's
    reduce_window (identical to ``flax.linen.max_pool``)."""
    if use_pallas_pool() and supported(x.shape):
        return maxpool2x2(x)
    # python-scalar init (like flax.linen.max_pool): an array-typed init
    # value breaks the reduce_window_max autodiff rule
    neg_inf = (-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
               else int(jnp.iinfo(x.dtype).min))
    return jax.lax.reduce_window(x, neg_inf, jax.lax.max,
                                 (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
