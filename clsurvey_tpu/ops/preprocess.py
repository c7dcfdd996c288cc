"""On-device image preprocessing (decode-normalize-augment).

The reference runs torchvision CPU transforms in DataLoader worker processes
(normalize with ImageNet stats + RandomHorizontalFlip for the
``rnd_transform`` dataset variants, ref:src/data/tinyimgnet_dataprep.py:
154-174). Here images live in HBM as uint8 and the whole transform is traced
into the jitted train step, so XLA fuses it with the first conv's input
conversion: no host round-trip, no worker processes, 4x less HBM traffic
than storing float32.

A Pallas kernel variant fuses u8->bf16 conversion, normalisation and flip in
one VMEM pass; the jnp path is the portable fallback (identical math) used on
CPU test meshes."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def normalize(images_u8: jnp.ndarray, mean, std,
              dtype=jnp.float32) -> jnp.ndarray:
    """(B,H,W,3) uint8 -> normalized float; fused scale/shift form."""
    # (x/255 - mean)/std == x * (1/(255*std)) - mean/std : one FMA on the VPU
    scale = (1.0 / (255.0 * jnp.asarray(std, jnp.float32)))
    shift = (jnp.asarray(mean, jnp.float32) /
             jnp.asarray(std, jnp.float32))
    out = images_u8.astype(jnp.float32) * scale - shift
    return out.astype(dtype)


def random_flip(rng: jax.Array, images: jnp.ndarray) -> jnp.ndarray:
    """Per-sample random horizontal flip (p=0.5)."""
    flip = jax.random.bernoulli(rng, 0.5, (images.shape[0], 1, 1, 1))
    return jnp.where(flip, images[:, :, ::-1, :], images)


def preprocess(rng: jax.Array, images_u8: jnp.ndarray, mean, std,
               augment: bool, dtype=jnp.float32) -> jnp.ndarray:
    x = normalize(images_u8, mean, std, dtype)
    if augment:
        x = random_flip(rng, x)
    return x


# ---------------------------------------------------------------------------
# Pallas fused kernel: uint8 -> normalized dtype in one VMEM pass.
# (Horizontal flip stays an XLA `rev` outside the kernel — Mosaic has no
# reverse primitive; XLA fuses the flip with the surrounding ops anyway.)
#
# Layout: a (B,H,W,3) VMEM block would pad the 3-channel lane dim to 128
# (~42x memory blowup — measured VMEM OOM at bs=200/64px). The kernel
# therefore works on the flattened (B, H*W*3) view, whose last dim is a
# multiple of 128 for all benchmark shapes, with the per-channel
# scale/shift pre-tiled to full rows.
# ---------------------------------------------------------------------------

def _norm_kernel(img_ref, scale_ref, shift_ref, out_ref):
    # Mosaic has no direct u8->f32 cast; hop through int32
    x = img_ref[...].astype(jnp.int32).astype(jnp.float32)
    out_ref[...] = (x * scale_ref[...] - shift_ref[...]).astype(
        out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("dtype",))
def normalize_pallas(images_u8: jnp.ndarray, scale: jnp.ndarray,
                     shift: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Fused u8->dtype normalization. ``scale``/``shift`` are (3,) f32
    (precomputed 1/(255*std) and mean/std). Gridded over the batch so VMEM
    holds one ~4MB block at a time."""
    import jax as _jax

    b, h, w, c = images_u8.shape
    n = h * w * c
    if n % 128:  # odd spatial sizes: let XLA handle it
        x = images_u8.astype(jnp.float32) * scale - shift
        return x.astype(dtype)
    flat = images_u8.reshape(b, n)
    scale_row = jnp.tile(scale, h * w)   # (n,) channel-fastest like HWC
    shift_row = jnp.tile(shift, h * w)
    bpe = 1 + 4 + jnp.dtype(dtype).itemsize  # u8 in + f32 compute + out
    budget_bytes = 6 * 1024 * 1024
    # lane blocking: largest divisor of n that's a multiple of 128 and
    # <=64K lanes (Mosaic: last block dim % 128 == 0 or == n)
    block_n = n
    for d in range(min(n, 64 * 1024), 127, -1):
        if n % d == 0 and d % 128 == 0:
            block_n = d
            break
    # sublane blocking: divisor of b, % 8 == 0 (or == b), fits budget
    budget_b = max(1, budget_bytes // max(block_n * bpe, 1))
    block_b = None
    for d in range(min(b, budget_b), 0, -1):
        if b % d == 0 and (d % 8 == 0 or d == b):
            block_b = d
            break
    if block_b is None:
        # no batch divisor fits the VMEM budget (e.g. prime b > budget):
        # a full-batch block would blow VMEM — let XLA handle it instead
        x = images_u8.astype(jnp.float32) * scale - shift
        return x.astype(dtype)

    out = pl.pallas_call(
        _norm_kernel,
        interpret=_jax.default_backend() == "cpu",
        out_shape=jax.ShapeDtypeStruct((b, n), dtype),
        grid=(b // block_b, n // block_n),
        in_specs=[
            pl.BlockSpec((block_b, block_n), lambda i, j: (i, j)),
            pl.BlockSpec((block_n,), lambda i, j: (j,)),
            pl.BlockSpec((block_n,), lambda i, j: (j,)),
        ],
        out_specs=pl.BlockSpec((block_b, block_n), lambda i, j: (i, j)),
    )(flat, scale_row, shift_row)
    return out.reshape(b, h, w, c)


def preprocess_pallas(rng: jax.Array, images_u8: jnp.ndarray, mean, std,
                      augment: bool, dtype=jnp.float32) -> jnp.ndarray:
    """Drop-in variant of ``preprocess`` with the normalization in Pallas."""
    scale = (1.0 / (255.0 * jnp.asarray(std, jnp.float32)))
    shift = (jnp.asarray(mean, jnp.float32)
             / jnp.asarray(std, jnp.float32))
    x = normalize_pallas(images_u8, scale, shift, dtype=dtype)
    if augment:
        x = random_flip(rng, x)
    return x
