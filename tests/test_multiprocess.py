"""True multi-process distributed tier: the ``mpiexec -n 2`` analog.

The reference validates PARPACK as separate OS processes on one node
(CMakeLists.txt:786-792) including a sub-communicator solve
(PARPACK/TESTS/MPI/issue46.f:18-30).  Here two OS processes, each with 2
local CPU devices, are stitched by jax.distributed + gloo collectives
into one 4-device world mesh; the row-sharded solver runs SPMD across
the process boundary — actual cross-process collectives, not virtual
devices.  tests/mp_worker.py is the rank program.
"""
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
import scipy.sparse.linalg as spla

HERE = Path(__file__).resolve().parent


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_world_and_submesh():
    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)          # worker sets its own device count
    procs = [
        subprocess.run if False else subprocess.Popen(
            [sys.executable, str(HERE / "mp_worker.py"), str(pid), "2",
             str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=str(HERE.parent))
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
            pytest.fail(f"worker timed out\n{out[-1000:]}\n{err[-1000:]}")
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)

    def phase(out, tag):
        for line in out.splitlines():
            if line.startswith(tag + " "):
                return np.array([float(x)
                                 for x in line.split(" ", 1)[1].split(",")])
        return None

    # scipy oracle (wraps the reference library)
    from arpack_ng_tpu import models
    _, a_sp = models.laplacian_2d(16, dtype=np.float64)
    sv, _ = spla.eigsh(a_sp.astype(np.float64), k=4, which="LA",
                       ncv=20, tol=1e-10)
    sv = np.sort(sv)

    # phase 1 ran only on process 0's sub-mesh (issue46 analog)
    v_sub = phase(outs[0], "PHASE1")
    assert v_sub is not None, outs[0]
    np.testing.assert_allclose(v_sub, sv, rtol=1e-8)

    # phase 2 ran on the world mesh in BOTH processes; results must agree
    # across ranks (replicated reduced space) and with the oracle
    v0 = phase(outs[0], "PHASE2")
    v1 = phase(outs[1], "PHASE2")
    assert v0 is not None and v1 is not None
    np.testing.assert_allclose(v0, v1, rtol=0, atol=0)   # bitwise: SPMD
    np.testing.assert_allclose(v0, sv, rtol=1e-8)
