"""clsurvey_tpu — a TPU-native continual-learning benchmark framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the CLsurvey
reference (task-incremental continual learning: 11 SOTA methods + 4 baselines
driven by a two-phase Continual Hyperparameter Framework), designed TPU-first:

- one jit-compiled, scan-over-batches training engine shared by all methods
  (the reference has eleven hand-written epoch loops);
- method mechanics (EWC/MAS/SI importance regularisation, LwF/EBLL
  distillation, GEM gradient projection, PackNet/HAT masking) expressed as
  pure functional gradient/loss transforms fused into the compiled step;
- data parallelism over a `jax.sharding.Mesh` with XLA collectives on ICI
  (the reference is single-GPU; here every task trains SPMD);
- episodic memories, importance tensors and per-task heads held as static-
  shape device arrays (the reference round-trips exemplars through the
  filesystem every batch).

Reference behavior citations in docstrings point into Mattdl/CLsurvey
(mounted at /root/reference) as `ref:src/...:<lines>`.
"""

__version__ = "0.1.0"

from clsurvey_tpu.utils import config as config  # noqa: F401
