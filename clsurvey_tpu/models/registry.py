"""Model-name parsing + init-model dump.

Mirrors the reference's behavior (ref:src/models/net.py:15-36
``parse_model_name``): the same model-name strings work
(``small_VGG9_cl_128_128[_BN][_DROP]``, ``base/wide_VGG9_cl_512_512``,
``deep_VGG22_cl_512_512``, ``alexnet[_pretrained]``), and the initial network
is created-and-pickled under ``models_root_path`` on first parse so every
method starts from the identical init (ref:src/models/net.py:243-262
``make_VGGmodel``). Our pickle holds a numpy pytree of
``{'params', 'batch_stats', 'heads'}`` rather than an nn.Module."""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from clsurvey_tpu.models import heads as heads_lib
from clsurvey_tpu.models.backbones import AlexNetBackbone, VGGBackbone
from clsurvey_tpu.utils import io



class ModelRegularization:
    vanilla = "vanilla"
    weight_decay = "L2"
    dropout = "DROP"
    batchnorm = "BN"


@dataclass
class ModelSpec:
    """Replaces the reference's Model type wrappers (ref:src/models/net.py:
    77-237). Holds the flax module factory + metadata; `path` is where the
    pickled init state lives."""

    name: str
    arch: str                      # vgg config name or 'alexnet'
    input_size: tuple              # (H, W)
    classifier_dims: tuple = ()
    batch_norm: bool = False
    dropout: bool = False
    pretrained: bool = False
    models_root_path: str = ""
    compute_dtype: Any = jnp.float32
    path: str = field(default="", init=False)

    def __post_init__(self):
        if self.arch == "alexnet":
            parent = os.path.join(self.models_root_path, "alexnet")
        else:
            parent = os.path.join(
                self.models_root_path,
                f"customVGG_input={self.input_size[0]}x{self.input_size[1]}")
        self.path = os.path.join(parent, self.name + ".pth.tar")

    def make_backbone(self):
        if self.arch == "alexnet":
            return AlexNetBackbone(dropout=True, dtype=self.compute_dtype)
        return VGGBackbone(
            cfg_name=self.arch,
            classifier_dims=self.classifier_dims,
            batch_norm=self.batch_norm,
            dropout=self.dropout,
            dtype=self.compute_dtype,
        )

    @property
    def feature_dim(self) -> int:
        if self.arch == "alexnet":
            return 4096
        return int(self.classifier_dims[-1])

    @property
    def has_batch_stats(self) -> bool:
        return self.batch_norm

    @property
    def uses_dropout(self) -> bool:
        return self.dropout or self.arch == "alexnet"


def _parse_classifier_dims(model_name: str) -> tuple:
    """``..._cl_128_128...`` -> (128, 128)."""
    segs = model_name.split("_")
    if "cl" not in segs:
        raise ValueError(f"no classifier spec ('_cl_d1_d2') in {model_name}")
    i = segs.index("cl")
    return (int(segs[i + 1]), int(segs[i + 2]))


def parse_model_name(models_root_path: str, model_name: str,
                     input_size: tuple, compute_dtype=jnp.float32) -> ModelSpec:
    """String -> ModelSpec (ref:src/models/net.py:15-36)."""
    segs = model_name.split("_")
    pretrained = "pretrained" in model_name
    if "alexnet" in model_name:
        return ModelSpec(model_name, "alexnet", input_size,
                         pretrained=pretrained,
                         models_root_path=models_root_path,
                         compute_dtype=compute_dtype)
    for cfg in ("small_VGG9", "wide_VGG9", "deep_VGG22", "base_VGG9",
                "tiny_CNN", "19normal", "16normal", "11normal"):
        if cfg in model_name:
            return ModelSpec(
                model_name, cfg, input_size,
                classifier_dims=_parse_classifier_dims(model_name),
                batch_norm=ModelRegularization.batchnorm in segs,
                dropout=ModelRegularization.dropout in segs,
                models_root_path=models_root_path,
                compute_dtype=compute_dtype,
            )
    raise NotImplementedError(f"MODEL NOT IMPLEMENTED YET: {model_name}")


def get_init_modelname(num_epochs, batch_size, lr_grid, weight_decay,
                       model_name) -> str:
    """First-task base-model experiment name (ref:src/models/net.py:39-53)."""
    name = [f"e={num_epochs}", f"bs={batch_size}", f"lr={sorted(lr_grid)}"]
    if weight_decay != 0:
        name.append(f"{ModelRegularization.weight_decay}={weight_decay}")
    if ModelRegularization.batchnorm in model_name:
        name.append(ModelRegularization.batchnorm)
    if ModelRegularization.dropout in model_name:
        name.append(ModelRegularization.dropout)
    return "_".join(name)


def init_model_state(spec: ModelSpec, key, max_tasks: int,
                     classes_per_task: int, class_counts=None) -> dict:
    """Initialise backbone params + head bank. Returns the canonical model
    state dict used throughout the framework:
    ``{'params', 'batch_stats', 'heads', 'meta'}``."""
    backbone = spec.make_backbone()
    pkey, hkey, dkey = jax.random.split(key, 3)
    dummy = jnp.zeros((2, spec.input_size[0], spec.input_size[1], 3),
                      dtype=jnp.float32)
    variables = backbone.init({"params": pkey, "dropout": dkey}, dummy,
                              train=False)
    if spec.pretrained:
        variables = dict(variables)
        variables["params"] = load_pretrained(spec, variables["params"])
    head_bank = heads_lib.init_head_bank(
        hkey, max_tasks, spec.feature_dim, classes_per_task, class_counts)
    return {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
        "heads": head_bank,
        "meta": {
            "model_name": spec.name,
            "max_tasks": max_tasks,
            "classes_per_task": classes_per_task,
        },
    }


def create_init_model(spec: ModelSpec, key, max_tasks: int,
                      classes_per_task: int, class_counts=None,
                      overwrite: bool = False) -> str:
    """Create + pickle the shared init model if missing
    (ref:src/models/net.py:243-262). Idempotent like the reference."""
    if io.exists(spec.path) and not overwrite:
        return spec.path
    state = init_model_state(spec, key, max_tasks, classes_per_task,
                             class_counts)
    io.save(state, spec.path)
    print(f"CREATED INIT MODEL {spec.name} -> {spec.path}")
    return spec.path


def load_pretrained(spec: ModelSpec, params: Any) -> Any:
    """Inject pretrained backbone weights (ref AlexNet uses torchvision's
    ImageNet weights, ref:src/models/net.py:96-125). This environment has no
    egress, so weights are read from ``<models_root>/<arch>_imagenet.npz``
    (a flat ``{'/'.join(path): array}`` dump) when present; otherwise the
    scratch init is kept with a warning."""
    import numpy as np

    path = os.path.join(spec.models_root_path,
                        f"{spec.arch}_imagenet.npz")
    if not os.path.isfile(path):
        if os.environ.get("CLSURVEY_ALLOW_SCRATCH_PRETRAINED"):
            print(f"[WARN] pretrained weights not found at {path}; "
                  f"using scratch init for {spec.name}")
            return params
        raise FileNotFoundError(
            f"'{spec.name}' requests pretrained weights but {path} does "
            f"not exist. Generate it with "
            f"scripts/dump_torchvision_alexnet.py (from torchvision or a "
            f"local torch checkpoint), or set "
            f"CLSURVEY_ALLOW_SCRATCH_PRETRAINED=1 to accept a scratch "
            f"init (results will not match the reference protocol).")
    flat_npz = dict(np.load(path))
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for key_path, leaf in flat:
        name = "/".join(getattr(k, "key", str(k)) for k in key_path)
        if name in flat_npz and flat_npz[name].shape == leaf.shape:
            out.append(jnp.asarray(flat_npz[name], leaf.dtype))
        else:
            print(f"[WARN] pretrained leaf missing/mismatched: {name}")
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def count_parameters(state: dict) -> int:
    """ref:src/models/net.py:282-300 param counting."""
    leaves = jax.tree_util.tree_leaves(
        {"params": state["params"],
         "heads": {"kernel": state["heads"]["kernel"],
                   "bias": state["heads"]["bias"]}})
    return sum(x.size for x in leaves)


def print_module_composition(state: dict) -> str:
    """Per-module parameter breakdown
    (ref:src/models/net.py:302-354 ``print_module_composition``)."""
    lines = []
    flat = jax.tree_util.tree_flatten_with_path(state["params"])[0]
    total = 0
    for key_path, leaf in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in key_path)
        lines.append(f"{name:50s} {str(leaf.shape):>20s} {leaf.size:>12d}")
        total += leaf.size
    heads = state["heads"]
    for hname in ("kernel", "bias"):
        leaf = heads[hname]
        lines.append(f"{'heads/' + hname:50s} "
                     f"{str(np.asarray(leaf).shape):>20s} "
                     f"{np.asarray(leaf).size:>12d}")
        total += np.asarray(leaf).size
    lines.append(f"{'TOTAL':50s} {'':>20s} {total:>12d}")
    report = "\n".join(lines)
    print(report)
    return report
