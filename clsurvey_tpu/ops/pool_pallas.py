"""Fused 2x2/2 max-pool with an argmax-routed VJP, as Pallas TPU kernels.

Why: XLA lowers the max-pool VJP to one select-and-scatter per pool —
the single largest line item of the flagship small_VGG9 step
(docs/PERF.md: 0.65 ms of a ~3.0 ms step, plus 0.18 ms pool0 forward).
This kernel pair stores a 2-bit argmax per output cell in the forward
and routes the cotangent directly in the backward — no
select-and-scatter, no 6-D window-broadcast materializations (the two
approaches already measured and rejected in docs/PERF.md).

Adoption is gated OFF by default (``CLSURVEY_PALLAS_POOL=1``): the conv
activations around the pools live in XLA-chosen batch-minor layouts
(docs/PERF.md "lane geometry"), so the kernel boundary can force
relayout copies that eat the win. ``scripts/bench_pool.py`` decides on
real TPU hardware.

Layout strategy: the NHWC array is viewed as 2-D ``(B*H, W*C)`` rows.
Vertical 2:1 reduction pairs adjacent sublane rows; horizontal 2:1
reduction groups the last dim as ``(Wo, 2*C)`` so the two horizontally-
adjacent pixels of a window sit in adjacent lane halves — for C=64 a
window-pair is exactly one 128-wide vreg. No strided slices (stride-2
slicing breaks (8,128) tiling — measured 2x slower, docs/PERF.md).

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


def _pick_rows_block(rows: int, row_bytes: int,
                     budget: int = 4 * 1024 * 1024) -> int | None:
    """Largest divisor of ``rows`` that fits the VMEM budget and keeps
    sublane-aligned (multiple of 8, or == rows)."""
    cap = max(1, budget // max(row_bytes, 1))
    for d in range(min(rows, cap), 0, -1):
        if rows % d == 0 and (d % 8 == 0 or d == rows):
            return d
    return None


def _fwd_kernel(c: int, x_ref, out_ref, idx_ref):
    rb2, wc = x_ref.shape
    rb = rb2 // 2
    wo = wc // (2 * c)
    x3 = x_ref[...].reshape(rb, 2, wc)
    top = x3[:, 0].reshape(rb, wo, 2 * c)
    bot = x3[:, 1].reshape(rb, wo, 2 * c)
    a, b = top[..., :c], top[..., c:]
    d, e = bot[..., :c], bot[..., c:]
    # first-max-in-window-order tie-break (matches select-and-scatter GE)
    t_ge = a >= b
    val_t = jnp.where(t_ge, a, b)
    idx_t = jnp.where(t_ge, jnp.uint8(0), jnp.uint8(1))
    b_ge = d >= e
    val_b = jnp.where(b_ge, d, e)
    idx_b = jnp.where(b_ge, jnp.uint8(2), jnp.uint8(3))
    f_ge = val_t >= val_b
    out_ref[...] = jnp.where(f_ge, val_t, val_b).reshape(rb, wo * c)
    idx_ref[...] = jnp.where(f_ge, idx_t, idx_b).reshape(rb, wo * c)


def _bwd_kernel(c: int, g_ref, idx_ref, dx_ref):
    rb, woc = g_ref.shape
    wo = woc // c
    g3 = g_ref[...].reshape(rb, wo, c)
    idx = idx_ref[...].reshape(rb, wo, c)
    zero = jnp.zeros_like(g3)
    top = jnp.concatenate(
        [jnp.where(idx == 0, g3, zero), jnp.where(idx == 1, g3, zero)],
        axis=-1).reshape(rb, 1, 2 * woc)
    bot = jnp.concatenate(
        [jnp.where(idx == 2, g3, zero), jnp.where(idx == 3, g3, zero)],
        axis=-1).reshape(rb, 1, 2 * woc)
    dx_ref[...] = jnp.concatenate([top, bot], axis=1).reshape(
        2 * rb, 2 * woc)


def supported(shape, dtype=None) -> bool:
    """Kernel preconditions: 4-D NHWC, even H and W, lane-aligned flats."""
    if len(shape) != 4:
        return False
    b, h, w, c = shape
    return (h % 2 == 0 and w % 2 == 0 and (w * c) % 256 == 0
            and ((w // 2) * c) % 128 == 0 and h >= 2 and w >= 2)


@functools.partial(jax.jit, static_argnames=())
def _fwd_pair(x):
    b, h, w, c = x.shape
    rows, wc = b * (h // 2), w * c
    flat = x.reshape(rows * 2, wc)
    bpe = 3 * jnp.dtype(x.dtype).itemsize + 1  # in + out + grad-ish + idx
    rb = _pick_rows_block(rows, 2 * wc * bpe)
    if rb is None:  # pathological row count: single-row blocks
        rb = 1
    out, idx = pl.pallas_call(
        functools.partial(_fwd_kernel, c),
        interpret=jax.default_backend() == "cpu",
        grid=(rows // rb,),
        out_shape=(
            jax.ShapeDtypeStruct((rows, wc // 2), x.dtype),
            jax.ShapeDtypeStruct((rows, wc // 2), jnp.uint8),
        ),
        in_specs=[pl.BlockSpec((2 * rb, wc), lambda i: (i, 0))],
        out_specs=(
            pl.BlockSpec((rb, wc // 2), lambda i: (i, 0)),
            pl.BlockSpec((rb, wc // 2), lambda i: (i, 0)),
        ),
    )(flat)
    return (out.reshape(b, h // 2, w // 2, c),
            idx.reshape(b, h // 2, w // 2, c))


def _bwd_dx(g, idx, x_shape):
    b, h, w, c = x_shape
    rows, woc = b * (h // 2), (w // 2) * c
    g2 = g.reshape(rows, woc)
    idx2 = idx.reshape(rows, woc)
    bpe = 3 * jnp.dtype(g.dtype).itemsize + 1
    rb = _pick_rows_block(rows, 2 * woc * bpe)
    if rb is None:
        rb = 1
    dx = pl.pallas_call(
        functools.partial(_bwd_kernel, c),
        interpret=jax.default_backend() == "cpu",
        grid=(rows // rb,),
        out_shape=jax.ShapeDtypeStruct((rows * 2, 2 * woc), g.dtype),
        in_specs=[
            pl.BlockSpec((rb, woc), lambda i: (i, 0)),
            pl.BlockSpec((rb, woc), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((2 * rb, 2 * woc), lambda i: (i, 0)),
    )(g2, idx2)
    return dx.reshape(b, h, w, c)


@jax.custom_vjp
def maxpool2x2(x):
    """2x2 stride-2 max pool (NHWC, even H/W) with argmax-routed VJP."""
    return _fwd_pair(x)[0]


def _vjp_fwd(x):
    out, idx = _fwd_pair(x)
    return out, (idx, x.shape)


def _vjp_bwd(res, g):
    idx, x_shape = res
    return (_bwd_dx(g, idx, x_shape),)


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
