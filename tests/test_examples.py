"""Examples-as-tests: every shipped example runs as a test, exactly as the
reference registers every example driver as a ctest (CMakeLists.txt:61-68 —
``examples()`` adds each EXAMPLES/ binary to the suite).  Slow tier: each is
a subprocess with a fresh interpreter, like the reference's process-level
runs.

Plus bug_1323 (TESTS/bug_1323.f:3-9) as a documented behavior: dseupd with
``rvec = .false.`` referenced the unallocated eigenvector output array ``z``
(SIGSEGV in dger at dseupd.f:852).  In this framework the defect is
structurally impossible — extraction is a pure function returning a fresh
pytree, and ``rvec=False`` never materializes a vector array — which the
test pins down.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = os.path.join(REPO, "examples")

_ALL = sorted(f for f in os.listdir(EXAMPLES) if f.endswith(".py"))


def _run_example(name, args=(), env_extra=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    if env_extra:
        env.update(env_extra)
    return subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, name), *map(str, args)],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO)


def test_examples_manifest_is_covered():
    """Fast-tier guard: a new example file must get a test entry
    (the reference's CMake examples() macro auto-registers; here the
    parametrized list below is the registry)."""
    assert _ALL == sorted(EXAMPLE_ARGS), (
        f"examples/ and EXAMPLE_ARGS disagree: {_ALL} vs "
        f"{sorted(EXAMPLE_ARGS)} — register the new example")


#: example -> small-size CLI args (keep each run < ~2 min on CPU)
EXAMPLE_ARGS = {
    "dssimp.py": ["16"],
    "dnsimp.py": [],
    "dsdrv4_shift_invert.py": [],
    "zndrv1.py": [],
    "svd.py": [],
    "distributed_laplacian.py": [],
    "validate_f64.py": [],
    "irregular_sparse.py": ["6000"],
}


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(EXAMPLE_ARGS))
def test_example_runs(name):
    r = _run_example(name, EXAMPLE_ARGS[name])
    assert r.returncode == 0, (
        f"{name} failed (rc={r.returncode})\nstdout:\n{r.stdout[-2000:]}\n"
        f"stderr:\n{r.stderr[-2000:]}")
    # every example self-reports residuals or eigenvalues; require output
    assert r.stdout.strip(), f"{name} produced no output"


class TestBug1323:
    """TESTS/bug_1323.f: dseupd(rvec=.false.) must not reference z."""

    def test_rvec_false_returns_no_vectors(self):
        import arpack_ng_tpu as at
        from arpack_ng_tpu import models

        op, a_sp = models.laplacian_1d(64, dtype=np.float64)
        # shift-invert mode 3 like the bug reproducer (dsdrv2 class)
        vals = at.eigsh(a_sp.toarray(), k=4, sigma=0.0, which="LM",
                        tol=1e-8, return_eigenvectors=False,
                        dtype=np.float64)
        assert np.all(np.isfinite(vals))
        # smallest eigenvalues of the 1-D Dirichlet Laplacian
        n = 64
        h = 1.0 / (n + 1)
        # models.laplacian_1d is the unscaled stencil: lam = 2(1-cos(j pi h))
        exact = np.array([2.0 * (1 - np.cos((j + 1) * np.pi * h))
                          for j in range(4)])
        assert np.allclose(np.sort(vals), np.sort(exact), rtol=1e-5)

    def test_extract_rvec_false_has_no_vector_array(self):
        from arpack_ng_tpu import models
        from arpack_ng_tpu.config import IRAMConfig
        from arpack_ng_tpu.core.device_sym import FusedSymSolver
        from arpack_ng_tpu.core.extract import extract

        op, _ = models.laplacian_1d(48, dtype=np.float64)
        cfg = IRAMConfig(n=op.n, nev=3, ncv=10, which="LA", symmetric=True,
                         dtype=np.dtype(np.float64), n_pad=op.n_pad,
                         tol=1e-8, max_iter=300)
        res = FusedSymSolver(op, cfg).solve()
        out = extract(op, cfg, res, rvec=False)
        # the z-array of the reference simply does not exist here: the
        # result pytree is freshly constructed and carries vectors=None
        assert out.vectors is None
        assert out.nconv >= 3
