"""Flax backbones: the custom VGG family + AlexNet.

Capability parity with the reference's model zoo
(ref:src/models/VGGSlim.py:13-24 feature configs;
ref:src/models/net.py:96-237 AlexNet + VGG wrappers), designed TPU-first:

- NHWC layout (XLA:TPU's native conv layout), 3x3 SAME convs → MXU;
- the backbone returns the penultimate *feature* vector; task heads live in
  a separate stacked head bank (``models/heads.py``) instead of being
  mutated into ``classifier._modules`` like the reference
  (ref:src/methods/method.py:230-235);
- compute dtype is configurable (bfloat16 by default on TPU) with fp32
  parameters and fp32 loss/batch-norm statistics.

Weight init mirrors torchvision's VGG ``_initialize_weights``: kaiming-normal
(fan_out, relu) for convs, N(0, 0.01) for linears, zero biases — so the
training dynamics envelope matches the reference.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import flax.linen as nn
import jax.numpy as jnp

from clsurvey_tpu.ops import pool_pallas

# Feature-extractor configs, numbers-as-data from the reference table
# (ref:src/models/VGGSlim.py:13-24). 'M' = 2x2 stride-2 max-pool.
VGG_CFG: dict[str, tuple] = {
    "19normal": (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
                 512, 512, 512, 512, "M", 512, 512, 512, 512, "M"),
    "16normal": (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                 512, 512, 512, "M", 512, 512, 512, "M"),
    "11normal": (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    "small_VGG9": (64, "M", 64, "M", 64, 64, "M", 128, 128, "M"),
    "base_VGG9": (64, "M", 64, "M", 128, 128, "M", 256, 256, "M"),
    "wide_VGG9": (64, "M", 128, "M", 256, 256, "M", 512, 512, "M"),
    "deep_VGG22": (64, "M", 64, 64, 64, 64, 64, 64, "M",
                   128, 128, 128, 128, 128, 128, "M",
                   256, 256, 256, 256, 256, 256, "M"),
    # ours: minimal net for fast CPU tests of the engine/methods (not a
    # reference model)
    "tiny_CNN": (8, "M", 16, "M"),
}

conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
dense_init = nn.initializers.normal(stddev=0.01)


@jax.custom_vjp
def relu(x):
    """relu with an output-based VJP.

    ``jax.nn.relu`` saves its INPUT for the backward mask, so in a
    conv+bias+relu block XLA must materialize both the pre-activation and
    the activation (2x ~105MB at the flagship's 200x64x64x64 stage — the
    step is HBM-bound there, see the r2 profile notes in docs/PERF.md).
    Masking on the OUTPUT (y > 0) is identical everywhere (at x==0 both
    give 0) and lets XLA fuse bias+relu into the conv and keep only the
    activation."""
    return jnp.maximum(x, 0)


def _relu_fwd(x):
    y = jnp.maximum(x, 0)
    return y, y


def _relu_bwd(y, g):
    return (jnp.where(y > 0, g, jnp.zeros_like(g)),)


relu.defvjp(_relu_fwd, _relu_bwd)


class VGGFeatures(nn.Module):
    """Conv feature extractor from a VGG config tuple."""

    cfg: tuple
    batch_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, v in enumerate(self.cfg):
            if v == "M":
                x = pool_pallas.pool2x2(x)
            else:
                x = nn.Conv(
                    int(v), (3, 3), padding="SAME", dtype=self.dtype,
                    kernel_init=conv_init, name=f"conv_{i}",
                )(x)
                if self.batch_norm:
                    x = nn.BatchNorm(
                        use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=jnp.float32, name=f"bn_{i}",
                    )(x)
                x = relu(x)
        return x


class ClassifierTrunk(nn.Module):
    """The two FC layers before the task head.

    The reference puts 3 FC layers in ``classifier`` and swaps the last one
    per task (ref:src/models/VGGSlim.py:58-76); here the trunk is the first
    two and the swap is a pure head-bank lookup."""

    dims: Sequence[int]  # (dim1, dim2)
    dropout: bool = False
    dtype: Any = jnp.float32
    # 'torch' = N(0, 0.01) like torchvision VGG (parity); 'kaiming' for the
    # non-reference test models where fast convergence matters more
    init_mode: str = "torch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        kinit = dense_init if self.init_mode == "torch" else conv_init
        for j, d in enumerate(self.dims):
            x = nn.Dense(int(d), dtype=self.dtype, kernel_init=kinit,
                         name=f"fc_{j}")(x)
            x = relu(x)
            if self.dropout:
                x = nn.Dropout(rate=0.5, deterministic=not train)(x)
        return x


class VGGBackbone(nn.Module):
    """features -> flatten -> trunk -> feature vector (head applied outside)."""

    cfg_name: str
    classifier_dims: Sequence[int]
    batch_norm: bool = False
    dropout: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = VGGFeatures(VGG_CFG[self.cfg_name], self.batch_norm, self.dtype,
                        name="features")(x, train=train)
        x = x.reshape((x.shape[0], -1))
        init_mode = "torch" if self.cfg_name != "tiny_CNN" else "kaiming"
        x = ClassifierTrunk(self.classifier_dims, self.dropout, self.dtype,
                            init_mode=init_mode, name="trunk")(x, train=train)
        return x.astype(jnp.float32)

    @property
    def feature_dim(self) -> int:
        return int(self.classifier_dims[-1])


class AlexNetBackbone(nn.Module):
    """AlexNet feature extractor + 2 FC trunk layers (ref:src/models/net.py:
    96-125 wraps torchvision alexnet; its classifier's last layer is the
    swapped head). Pretrained ImageNet weights can be injected via the
    registry's ``load_pretrained`` hook; default is scratch init."""

    dropout: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = lambda f, k, s, p, name: nn.Conv(
            f, (k, k), strides=(s, s), padding=[(p, p), (p, p)],
            dtype=self.dtype, kernel_init=conv_init, name=name)
        x = relu(conv(64, 11, 4, 2, "conv_0")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = relu(conv(192, 5, 1, 2, "conv_1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = relu(conv(384, 3, 1, 1, "conv_2")(x))
        x = relu(conv(256, 3, 1, 1, "conv_3")(x))
        x = relu(conv(256, 3, 1, 1, "conv_4")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = x.reshape((x.shape[0], -1))  # 6*6*256 for 224x224 input
        for j in (0, 1):
            if self.dropout:
                x = nn.Dropout(rate=0.5, deterministic=not train)(x)
            x = nn.Dense(4096, dtype=self.dtype, kernel_init=dense_init,
                         name=f"fc_{j}")(x)
            x = relu(x)
        return x.astype(jnp.float32)

    @property
    def feature_dim(self) -> int:
        return 4096
