"""dnsimp equivalent (EXAMPLES/SIMPLE/dnsimp.f): largest-magnitude
eigenvalues of the 2-D convection-diffusion operator (non-symmetric;
complex conjugate pairs in real arithmetic).

Run:  python examples/dnsimp.py [nx]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys

import numpy as np

import arpack_ng_tpu as at
from arpack_ng_tpu import models


def main(nx=20):
    op, a_sp = models.convection_diffusion_2d(nx, rho=100.0,
                                              dtype=np.float64)
    vals, vecs = at.eigs(op, k=4, which="LM", tol=1e-10)
    for i, lam in enumerate(vals):
        r = np.linalg.norm(a_sp @ vecs[:, i] - lam * vecs[:, i])
        print(f"  lambda[{i}] = {lam:.8f}   ||A x - lam x|| = {r:.3e}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20)
