"""Multi-process distributed worker (the PARPACK mpiexec rank program).

Launched N times by tests/test_multiprocess.py with distinct process ids —
the analog of the reference running every PARPACK test under
``mpiexec -n 2`` (CMakeLists.txt:786-792).  Each OS process owns 2 local
CPU devices; jax.distributed + gloo collectives stitch them into one
global mesh, and the row-sharded solver runs SPMD across processes
exactly like pdsaupd ranks.

Also performs the issue46 protocol (PARPACK/TESTS/MPI/issue46.f:18-30):
first an eigensolve on a SUB-mesh owned by process 0 only (the
MPI_Comm_split sub-communicator analog — other processes idle), then the
same problem on the full world mesh; both must agree.

Prints one line per phase: ``PHASE<k> <val1,val2,...>``; exit code 0 on
success.
"""
import os
import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))        # repo root

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid)
    jax.config.update("jax_enable_x64", True)

    import numpy as np
    from jax.sharding import Mesh

    from arpack_ng_tpu import api, models

    assert len(jax.devices()) == 2 * nproc, \
        f"expected {2 * nproc} global devices, got {len(jax.devices())}"

    op, a_sp = models.laplacian_2d(16, dtype=np.float64)   # n = 256

    # ---- phase 1 (issue46 sub-communicator analog): process 0 solves on
    # its OWN local devices; other processes do not participate ----------
    if pid == 0:
        local = np.array(jax.local_devices())
        sub_mesh = Mesh(local, ("rows",))
        vals_sub = api.eigsh(op, k=4, which="LA", ncv=20, tol=1e-10,
                             mesh=sub_mesh, return_eigenvectors=False)
        print("PHASE1 " + ",".join(f"{v:.12e}" for v in np.sort(vals_sub)),
              flush=True)

    # ---- phase 2: the full world mesh (all processes, SPMD) ------------
    world = Mesh(np.array(jax.devices()), ("rows",))
    vals = api.eigsh(op, k=4, which="LA", ncv=20, tol=1e-10,
                     mesh=world, return_eigenvectors=False)
    print("PHASE2 " + ",".join(f"{v:.12e}" for v in np.sort(vals)),
          flush=True)

    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
