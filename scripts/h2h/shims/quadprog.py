"""quadprog shim for the reference clone. The real package (Goldfarb-
Idnani dual QP C extension, ref:requirements.txt:51) is not installed;
GEM imports it at module load (ref:src/methods/rehearsal/model/gem.py:12).
``solve_qp`` delegates to scipy's QP-equivalent solve via a tiny active-set
loop ONLY if actually called; the Finetune/EWC head-to-head never calls it.
"""

import numpy as np


def solve_qp(G, a, C, b, meq=0):  # pragma: no cover - GEM-only path
    """Minimize 1/2 x^T G x - a^T x  s.t.  C^T x >= b (quadprog's API).

    Projected-gradient fallback, adequate for GEM's small dual problems;
    raises if it fails to converge so a silent wrong answer can't leak
    into a parity study.
    """
    G = np.asarray(G, float)
    a = np.asarray(a, float)
    C = np.asarray(C, float)
    b = np.asarray(b, float)
    n = G.shape[0]
    x = np.linalg.solve(G, a)
    lr = 1.0 / max(np.linalg.norm(G, 2), 1e-12)
    for _ in range(20000):
        grad = G @ x - a
        x = x - lr * grad
        # project approximately onto {C^T x >= b} by clipping violations
        viol = C.T @ x - b
        bad = viol < -1e-12
        if not bad.any():
            continue
        for j in np.where(bad)[0]:
            cj = C[:, j]
            x = x - (cj @ x - b[j]) / (cj @ cj) * cj
    viol = C.T @ x - b
    if (viol < -1e-6).any():
        raise RuntimeError("quadprog shim failed to satisfy constraints")
    return x, 0.5 * x @ G @ x - a @ x, None, None, None, None
