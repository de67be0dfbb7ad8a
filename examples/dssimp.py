"""dssimp equivalent (EXAMPLES/SIMPLE/dssimp.f): 4 largest eigenvalues of
the 2-D Dirichlet Laplacian via the symmetric solver, with the residual
check ||A x - lambda x|| the reference driver self-reports.

Run:  python examples/dssimp.py [nx]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys

import numpy as np

import arpack_ng_tpu as at
from arpack_ng_tpu import models


def main(nx=32):
    op, a_sp = models.laplacian_2d(nx, dtype=np.float32)
    vals, vecs, out = at.eigsh(op, k=4, which="LA", tol=1e-5,
                               return_stats=True)
    print(f"n = {op.n}  (nx = {nx});  {out.nconv} converged in "
          f"{out.n_iter} restart iterations")
    for i, lam in enumerate(vals):
        r = np.linalg.norm(a_sp @ vecs[:, i] - lam * vecs[:, i])
        print(f"  lambda[{i}] = {lam:.8f}   ||A x - lam x|| = {r:.3e}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
