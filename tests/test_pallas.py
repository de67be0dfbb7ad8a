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
