"""Pallas DIA SpMV kernel tests (interpret mode on CPU; the compiled
path is exercised by bench runs on TPU hardware)."""
import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from arpack_ng_tpu.ops.pallas_dia import make_pallas_dia_matvec


def _build(offs, n, rng):
    diags, mats = [], []
    for o in offs:
        arr = np.zeros(n)
        m = n - abs(o)
        vals = rng.standard_normal(m)
        if o >= 0:
            arr[:m] = vals
            mats.append(sp.diags(vals, o, shape=(n, n)))
        else:
            arr[-o:] = vals
            mats.append(sp.diags(vals, o, shape=(n, n)))
        diags.append(arr)
    return diags, sum(mats).tocsr()


@pytest.mark.parametrize("offs", [
    [0],
    [-1, 0, 1],
    [-130, -63, -1, 0, 1, 63, 130],
    [-256, 0, 256],
])
def test_interpret_matches_sparse(offs, rng):
    n, n_pad = 4000, 4096
    diags, a = _build(offs, n, rng)
    mv = make_pallas_dia_matvec(offs, diags, n, n_pad, tile_rows=8,
                                interpret=True)
    x = np.zeros(n_pad)
    x[:n] = rng.standard_normal(n)
    y = np.asarray(mv(jnp.asarray(x)))
    np.testing.assert_allclose(y[:n], a @ x[:n], atol=1e-12)
    assert np.abs(y[n:]).max() == 0.0


def test_uneven_tile_fallback(rng):
    # rows not divisible by default tile: constructor must adapt
    n = n_pad = 1280  # 10 rows of 128
    diags, a = _build([-1, 0, 1], n, rng)
    mv = make_pallas_dia_matvec([-1, 0, 1], diags, n, n_pad,
                                interpret=True)
    x = rng.standard_normal(n_pad)
    y = np.asarray(mv(jnp.asarray(x)))
    np.testing.assert_allclose(y, a @ x, atol=1e-12)


class TestCGSKernels:
    """ops/pallas_cgs.py: the hand-scheduled CGS passes (interpret mode
    here; the compiled path is measured by benchmarks/bench_pallas_cgs.py
    on TPU hardware)."""

    @pytest.mark.parametrize("rows", [8, 16, 24])
    def test_proj_update_match_gemv(self, rows, rng):
        from arpack_ng_tpu.ops import pallas_cgs
        ncv, n_pad = 32, 128 * 40
        V = rng.standard_normal((ncv, n_pad)).astype(np.float32)
        w = rng.standard_normal(n_pad).astype(np.float32)
        proj = pallas_cgs.make_proj(rows, ncv, n_pad, "float32", "float32",
                                    interpret=True)
        upd = pallas_cgs.make_update(rows, ncv, n_pad, "float32", "float32",
                                     interpret=True, with_norm=True)
        h = np.asarray(proj(jnp.asarray(V), jnp.asarray(w)))
        np.testing.assert_allclose(h, V[:rows] @ w, rtol=2e-5, atol=1e-3)
        r, n2 = upd(jnp.asarray(w), jnp.asarray(h), jnp.asarray(V))
        r, n2 = np.asarray(r).reshape(-1), float(n2)
        r_ref = w - h @ V[:rows]
        np.testing.assert_allclose(r, r_ref, rtol=1e-4, atol=1e-2)
        n2_ref = float(np.sum(r_ref * r_ref))
        assert abs(n2 - n2_ref) < 1e-3 * max(1.0, n2_ref)

    def test_bf16_storage_accumulates_f32(self, rng):
        from arpack_ng_tpu.ops import pallas_cgs
        rows, ncv, n_pad = 16, 24, 128 * 32
        V = jnp.asarray(rng.standard_normal((ncv, n_pad)),
                        dtype=jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal(n_pad), dtype=jnp.float32)
        proj = pallas_cgs.make_proj(rows, ncv, n_pad, "bfloat16", "float32",
                                    interpret=True)
        h = np.asarray(proj(V, w))
        href = np.asarray(V[:rows].astype(jnp.float32)) @ np.asarray(w)
        np.testing.assert_allclose(h, href, rtol=1e-4, atol=1e-2)

    def test_full_solve_pallas_cgs(self, rng):
        """End-to-end eigsh with cgs_kernel='pallas' (interpret mode on
        CPU) matches the XLA path and the residual oracle.  ncv=20 also
        exercises the non-multiple-of-8 last bucket's XLA fallback."""
        import arpack_ng_tpu as at
        from arpack_ng_tpu import models
        op, a = models.laplacian_2d(24, dtype=np.float32)  # n=576, pad 640
        vals_p, vecs_p = at.eigsh(op, k=4, which="LA", ncv=20, tol=1e-5,
                                  cgs_kernel="pallas")
        vals_x, _ = at.eigsh(op, k=4, which="LA", ncv=20, tol=1e-5,
                             cgs_kernel="xla")
        np.testing.assert_allclose(vals_p, vals_x, rtol=2e-4)
        for i in range(4):
            r = np.linalg.norm(a @ vecs_p[:, i] - vals_p[i] * vecs_p[:, i])
            assert r < 1e-3

    def test_rotate_rows_inplace_kernel(self, rng):
        """make_rotate_rows (dsapps kev-row restart rotation): top rows
        match Q[:, :R]^T V, the aliased tail is preserved untouched, and
        bf16 storage accumulates in f32."""
        from arpack_ng_tpu.ops import pallas_rot
        ncv, npan = 32, 64
        V = jnp.asarray(rng.standard_normal((ncv, npan, 128)) * 1e-1,
                        dtype=jnp.float32)
        Q = jnp.asarray(rng.standard_normal((ncv, ncv)), jnp.float32)
        for rows in (8, 16, 24):
            k = pallas_rot.make_rotate_rows(ncv, rows, npan, "float32",
                                            "float32", interpret=True)
            out = np.asarray(k(Q[:, :rows], V))
            ref = np.einsum("ij,ipl->jpl", np.asarray(Q[:, :rows]),
                            np.asarray(V))
            np.testing.assert_allclose(out[:rows], ref, rtol=1e-4,
                                       atol=1e-5)
            np.testing.assert_array_equal(out[rows:],
                                          np.asarray(V)[rows:])
        kb = pallas_rot.make_rotate_rows(ncv, 16, npan, "bfloat16",
                                         "float32", interpret=True)
        Vb = V.astype(jnp.bfloat16)
        outb = np.asarray(kb(Q[:, :16].astype(jnp.bfloat16), Vb)
                          .astype(jnp.float32))
        refb = np.einsum("ij,ipl->jpl",
                         np.asarray(Q[:, :16].astype(jnp.bfloat16)
                                    .astype(jnp.float32)),
                         np.asarray(Vb.astype(jnp.float32)))
        np.testing.assert_allclose(outb[:16], refb, rtol=2e-2, atol=2e-2)
