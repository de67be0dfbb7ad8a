"""Complex Hermitian Lanczos (extension beyond the reference, which has
no c/z symmetric driver): real tridiagonal reduced space over a complex
basis — both strategies, plus the svds complex routing."""
import numpy as np
import pytest

import arpack_ng_tpu as at


def _herm(rng, n):
    a = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    return (a + a.conj().T) / 2


@pytest.mark.parametrize("strategy", ["fused", "hybrid"])
@pytest.mark.parametrize("which", ["LA", "SA", "LM"])
def test_hermitian_eigsh(strategy, which, rng):
    n = 140
    a = _herm(rng, n)
    vals, vecs = at.eigsh(a.astype(np.complex128), k=4, which=which,
                          tol=1e-10, maxiter=800, strategy=strategy,
                          ncv=20)
    w = np.linalg.eigvalsh(a)
    if which == "LA":
        ref = w[-4:]
    elif which == "SA":
        ref = w[:4]
    else:
        ref = w[np.argsort(np.abs(w))][-4:]
    np.testing.assert_allclose(np.sort(vals), np.sort(ref), rtol=1e-8,
                               atol=1e-10)
    for i in range(4):
        r = np.linalg.norm(a @ vecs[:, i] - vals[i] * vecs[:, i])
        assert r < 1e-7
    assert np.isrealobj(vals)


def test_hermitian_vs_general_complex(rng):
    # Hermitian path must agree with the general complex driver
    n = 120
    a = _herm(rng, n)
    vh = at.eigsh(a.astype(np.complex128), k=3, which="LA", tol=1e-10,
                  return_eigenvectors=False, ncv=16)
    vg = at.eigs(a.astype(np.complex128), k=3, which="LR", tol=1e-10,
                 return_eigenvectors=False, ncv=16)
    np.testing.assert_allclose(np.sort(vh), np.sort(vg.real), rtol=1e-8)


def test_svds_complex_hermitian_route(rng):
    m, n = 150, 60
    a = (rng.standard_normal((m, n)) + 1j * rng.standard_normal((m, n)))
    u, s, vh = at.svds(a.astype(np.complex128), k=3, tol=1e-10)
    s_ref = np.linalg.svd(a, compute_uv=False)
    np.testing.assert_allclose(s, np.sort(s_ref[:3]), rtol=1e-8)
