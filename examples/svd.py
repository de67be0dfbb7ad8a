"""dsvd equivalent (EXAMPLES/SVD/dsvd.f): leading singular triplets via
Lanczos on the normal equations.

Run:  python examples/svd.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import arpack_ng_tpu as at


def main(m=500, n=120, k=5):
    rng = np.random.default_rng(0)
    a = rng.standard_normal((m, n))
    u, s, vh = at.svds(a.astype(np.float64), k=k, tol=1e-10)
    print("singular values (normal equations, dsvd class):",
          np.round(s, 6))
    for i in range(k):
        r = np.linalg.norm(a @ vh[i] - s[i] * u[:, i])
        print(f"  ||A v - s u||[{i}] = {r:.3e}")

    # the augmented (cyclic-operator) method: kappa- instead of
    # kappa^2-limited accuracy — decisive for small singular values or
    # float32 (an extension over the reference's dsvd construction)
    u2, s2, vh2 = at.svds(a.astype(np.float64), k=k, tol=1e-10,
                          method="augmented")
    print("singular values (augmented):", np.round(s2, 6))


if __name__ == "__main__":
    main()
