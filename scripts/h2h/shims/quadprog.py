"""quadprog shim for the reference clone. The real package (Goldfarb-
Idnani dual QP C extension, ref:requirements.txt:51) is not installed;
GEM imports it at module load (ref:src/methods/rehearsal/model/gem.py:12).

GEM's only call pattern is bounds-only (C == I, h = margin·1 —
ref:gem.py:71-77), which is exactly the problem our native PDAS solver
(native/qp.cpp, golden-tested three ways against the JAX implementation
in clsurvey_tpu/ops/qp.py) solves exactly. Delegating means the
reference's GEM head-to-head projects with the same arithmetic our GEM
uses — any remaining trajectory difference is framework behavior, not
solver noise.
"""

import os
import sys

import numpy as np

# .../{scripts/h2h,clsurvey_runs/refclone}/shims/quadprog.py -> repo root
_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from clsurvey_tpu.ops import qp_native  # noqa: E402


def solve_qp(G, a, C, b, meq=0):
    """quadprog API: minimize 1/2 x^T G x - a^T x  s.t.  C^T x >= b."""
    G = np.asarray(G, float)
    a = np.asarray(a, float)
    C = np.asarray(C, float)
    b = np.asarray(b, float)
    n = a.shape[0]
    if meq == 0 and C.shape == (n, n) and np.array_equal(C, np.eye(n)):
        # bounds-only: exact PDAS solve (min 1/2 v'Pv - q'v, v >= lb)
        x = qp_native.solve_bound_qp(G, a, b)
        return x, 0.5 * x @ G @ x - a @ x, None, None, None, None
    raise NotImplementedError(
        "quadprog shim only supports GEM's bounds-only pattern (C == I)")
