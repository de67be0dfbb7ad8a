"""Realification fallback tests: complex problems through the real
drivers (for backends without complex-arithmetic support)."""
import numpy as np
import pytest

from arpack_ng_tpu.ops.realify import eigs_realified, realify_dense


def test_general_complex(rng):
    n = 90
    a = (rng.standard_normal((n, n))
         + 1j * rng.standard_normal((n, n))) / np.sqrt(n)
    vals, vecs = eigs_realified(a.astype(np.complex128), k=4, which="LM",
                                tol=1e-10, maxiter=1000)
    assert len(vals) == 4
    w = np.linalg.eigvals(a)
    wtop = np.sort(np.abs(w))[-4:]
    np.testing.assert_allclose(np.sort(np.abs(vals)), wtop, rtol=1e-7)
    for i in range(4):
        r = np.linalg.norm(a @ vecs[:, i] - vals[i] * vecs[:, i])
        assert r < 1e-7


def test_hermitian_routes_symmetric(rng):
    n = 100
    a = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    a = ((a + a.conj().T) / 2).astype(np.complex128)
    op = realify_dense(a)
    assert op.hermitian
    vals, vecs = eigs_realified(a, k=3, which="LA", tol=1e-10)
    w = np.linalg.eigvalsh(a)
    np.testing.assert_allclose(np.sort(vals.real), w[-3:], rtol=1e-8)
    for i in range(3):
        r = np.linalg.norm(a @ vecs[:, i] - vals[i] * vecs[:, i])
        assert r < 1e-7


def test_rejects_real_input(rng):
    with pytest.raises(ValueError, match="complex"):
        realify_dense(rng.standard_normal((10, 10)))
