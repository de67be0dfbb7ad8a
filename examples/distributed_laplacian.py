"""pdsdrv1 equivalent (PARPACK/EXAMPLES/MPI/pdsdrv1.f): row-partitioned
2-D Laplacian across the device mesh with explicit halo exchange.

Run on N devices (or simulate):
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python examples/distributed_laplacian.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import numpy as np

import arpack_ng_tpu as at
from arpack_ng_tpu.models.distributed import laplacian_2d_sharded
from arpack_ng_tpu.parallel.sharding import make_mesh


def main(nx=128, ny=64):
    mesh = make_mesh()
    ndev = mesh.devices.size
    ny = ny - (ny % ndev) or ndev
    print(f"mesh: {ndev} devices; grid {nx}x{ny}")
    op, a_sp = laplacian_2d_sharded(nx, ny, mesh, dtype=np.float32)
    vals, vecs = at.eigsh(op, k=4, which="LA", tol=1e-5, mesh=mesh)
    for i, lam in enumerate(vals):
        r = np.linalg.norm(a_sp @ vecs[:, i] - lam * vecs[:, i])
        print(f"  lambda[{i}] = {lam:.6f}   resid = {r:.3e}")


if __name__ == "__main__":
    main()
