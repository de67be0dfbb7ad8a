"""Native C++ reduced-space kernel tests (native/src/reduced.cc vs
scipy/LAPACK oracles) — the framework's L0-layer validation."""
import numpy as np
import pytest
import scipy.linalg as sla

from arpack_ng_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def _tridiag(rng, n):
    alpha = rng.standard_normal(n)
    beta = np.abs(rng.standard_normal(n - 1)) + 0.1
    T = np.diag(alpha) + np.diag(beta, 1) + np.diag(beta, -1)
    return alpha, beta, T


class TestStqrb:
    @pytest.mark.parametrize("n", [2, 5, 24, 60])
    def test_matches_lapack(self, rng, n):
        alpha, beta, _ = _tridiag(rng, n)
        w_ref, S_ref = sla.eigh_tridiagonal(alpha, beta)
        d, bounds = native.stqrb(alpha, beta, 2.5)
        np.testing.assert_allclose(d, w_ref, rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(bounds, 2.5 * np.abs(S_ref[-1, :]),
                                   rtol=1e-9, atol=1e-12)

    def test_clustered(self, rng):
        # near-degenerate spectrum
        alpha = np.ones(30)
        beta = np.full(29, 1e-9)
        d, bounds = native.stqrb(alpha, beta, 1.0)
        np.testing.assert_allclose(d, np.sort(
            sla.eigh_tridiagonal(alpha, beta)[0]), atol=1e-12)


class TestSteqr:
    def test_full_decomposition(self, rng):
        alpha, beta, T = _tridiag(rng, 32)
        d, S = native.steqr(alpha, beta)
        np.testing.assert_allclose(T @ S, S @ np.diag(d), atol=1e-12)
        np.testing.assert_allclose(S.T @ S, np.eye(32), atol=1e-12)


class TestSymShiftQ:
    def test_single_shift_equals_explicit_qr(self, rng):
        n = 12
        alpha, beta, T = _tridiag(rng, n)
        mu = 0.37
        Qx, _ = np.linalg.qr(T - mu * np.eye(n))
        Tx = Qx.T @ T @ Qx
        d, e, Qn = native.sym_shift_q(alpha, beta, np.array([mu]))
        np.testing.assert_allclose(np.diag(Tx), d, atol=1e-12)
        np.testing.assert_allclose(np.abs(np.diag(Tx, -1)),
                                   np.abs(e[: n - 1]), atol=1e-12)

    def test_multi_shift_similarity(self, rng):
        n = 24
        alpha, beta, T = _tridiag(rng, n)
        w = np.sort(sla.eigh_tridiagonal(alpha, beta)[0])
        shifts = w[:8]
        d, e, Q = native.sym_shift_q(alpha, beta, shifts)
        # orthogonal similarity + subdiagonal sign convention
        np.testing.assert_allclose(Q.T @ Q, np.eye(n), atol=1e-12)
        Tc = Q.T @ T @ Q
        np.testing.assert_allclose(np.diag(Tc), d, atol=1e-10)
        assert np.all(e >= 0)
        # exact shifts purge their eigenvalues from the leading block:
        # the retained leading (n-8) block's spectrum approximates the
        # non-shifted eigenvalues
        lead = np.diag(d[: n - 8]) + np.diag(e[: n - 9], 1) \
            + np.diag(e[: n - 9], -1)
        wl = np.sort(np.linalg.eigvalsh(lead))
        np.testing.assert_allclose(wl, w[8:], atol=1e-6)


class TestSymShiftQIllConditioned:
    """Round-1 review: the native Givens chase's equivalence to explicit
    QR was asserted only end-to-end; pin it directly at ill-conditioned
    shifts (shift at/near an eigenvalue, clustered spectra, huge dynamic
    range) against a float64 explicit-QR oracle."""

    def _ill_cases(self, rng):
        cases = []
        # (a) shift exactly AT an eigenvalue (QR of an exactly singular
        # T - mu I: the chase's deflation path)
        n = 16
        alpha, beta, T = _tridiag(rng, n)
        w = np.sort(sla.eigh_tridiagonal(alpha, beta)[0])
        cases.append((alpha, beta, T, np.array([w[3]])))
        # (b) shift within eps of an eigenvalue
        cases.append((alpha, beta, T,
                      np.array([w[5] * (1 + 1e-15) + 1e-15])))
        # (c) clustered spectrum: T from eigenvalues 1 + k*1e-12
        lam = 1.0 + np.arange(n) * 1e-12
        q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        A = (q * lam) @ q.T
        # Householder tridiagonalization via scipy
        from scipy.linalg import hessenberg
        H, _ = hessenberg(A, calc_q=True)
        a2 = np.diag(H).copy()
        b2 = np.abs(np.diag(H, -1)).copy()
        T2 = np.diag(a2) + np.diag(b2, 1) + np.diag(b2, -1)
        cases.append((a2, b2, T2, np.array([1.0])))
        # (d) huge dynamic range diagonals
        a3 = np.array([1e12, 1e-8, 3.0, 1e10, 2e-6, 7.0, 1e8, 5.0])
        b3 = np.abs(rng.standard_normal(7)) + 0.1
        T3 = np.diag(a3) + np.diag(b3, 1) + np.diag(b3, -1)
        cases.append((a3, b3, T3, np.array([5.0, 1e-8])))
        return cases

    def test_against_explicit_qr_oracle(self, rng):
        for alpha, beta, T, shifts in self._ill_cases(rng):
            n = len(alpha)
            d, e, Q = native.sym_shift_q(alpha, beta, shifts)
            # Q orthogonal to roundoff regardless of conditioning
            np.testing.assert_allclose(Q.T @ Q, np.eye(n), atol=5e-13)
            # similarity: Q^T T Q agrees with the returned tridiagonal
            Tc = Q.T @ T @ Q
            scale = max(1.0, np.abs(T).max())
            np.testing.assert_allclose(np.diag(Tc) / scale, d / scale,
                                       atol=5e-12)
            np.testing.assert_allclose(
                np.abs(np.diag(Tc, -1)) / scale,
                np.abs(e[: n - 1]) / scale, atol=5e-12)
            # spectrum preserved exactly (similarity invariant)
            w0 = np.sort(sla.eigh_tridiagonal(
                alpha.astype(float), beta.astype(float))[0])
            mask = np.abs(e[: n - 1]) > 0
            wc = np.sort(np.linalg.eigvalsh(
                np.diag(d) + np.diag(e[: n - 1], 1)
                + np.diag(e[: n - 1], -1)))
            np.testing.assert_allclose(wc, w0, atol=5e-12 * scale)


def test_sym_eigt_falls_back_when_native_ql_fails(monkeypatch):
    """The native QL can exhaust its sweep cap (observed on an f32
    floor-tolerance H at n=1M, round 4); sym_eigt must fall back to
    LAPACK instead of failing the solve (the reference would surface
    dsteqr's info>0 as dsaupd info=-8)."""
    import numpy as np
    from arpack_ng_tpu.core import reduced
    from arpack_ng_tpu import native as _native

    def boom(*a, **k):
        raise RuntimeError("atpu_steqr_d failed: info=1")

    monkeypatch.setattr(_native, "steqr", boom)
    monkeypatch.setattr(_native, "stqrb", boom)
    rng = np.random.default_rng(0)
    alpha = rng.standard_normal(12)
    beta = np.abs(rng.standard_normal(11))
    ritz, bounds, S = reduced.sym_eigt(alpha, beta, 0.5)
    ref = np.sort(np.linalg.eigvalsh(np.diag(alpha) + np.diag(beta, 1)
                                     + np.diag(beta, -1)))
    np.testing.assert_allclose(np.sort(ritz), ref, rtol=1e-12)
    assert S is not None and bounds.shape == (12,)
