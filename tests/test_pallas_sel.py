"""Unit tests for the scalar-prefetch eta-subset event kernels
(ops/pallas_sel.py) in interpreter mode — kernel semantics vs the dense
reference; the on-TPU value check lives in benchmarks/bench_sel_gather.py
(the repo rule: VALUE-check every new TPU path)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arpack_ng_tpu.ops import pallas_sel


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    ncv, npan = 24, 16
    V = rng.standard_normal((ncv, npan, 128)).astype(np.float32)
    br = rng.standard_normal((npan * 128,)).astype(np.float32)
    r = rng.standard_normal((npan * 128,)).astype(np.float32)
    return ncv, npan, V, br, r


@pytest.mark.parametrize("K", [8, 16, 24])
def test_proj_matches_dense(data, K):
    ncv, npan, V, br, r = data
    idx = np.random.default_rng(K).permutation(ncv)[:K].astype(np.int32)
    proj = pallas_sel.make_sel_proj(K, ncv, npan, "float32", "float32",
                                    panels=8, interpret=True)
    s = np.asarray(proj(jnp.asarray(idx), jnp.asarray(V), jnp.asarray(br)))
    ref = np.array([V[i].reshape(-1) @ br for i in idx], np.float32)
    np.testing.assert_allclose(s, ref, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("with_norm", [False, True])
def test_update_matches_dense(data, with_norm):
    ncv, npan, V, br, r = data
    K = 16
    idx = np.random.default_rng(1).permutation(ncv)[:K].astype(np.int32)
    s = np.random.default_rng(2).standard_normal(K).astype(np.float32)
    upd = pallas_sel.make_sel_update(K, ncv, npan, "float32", "float32",
                                     panels=8, with_norm=with_norm,
                                     interpret=True)
    out = upd(jnp.asarray(idx), jnp.asarray(s), jnp.asarray(r),
              jnp.asarray(V))
    ref = r - np.einsum("k,kx->x", s, V[idx].reshape(K, -1))
    if with_norm:
        r2, nrm = out
        np.testing.assert_allclose(float(nrm), float(ref @ ref),
                                   rtol=1e-5)
    else:
        r2 = out
    np.testing.assert_allclose(np.asarray(r2), ref, rtol=1e-4, atol=1e-4)


def test_masked_rows_are_noops(data):
    # a zero coefficient must make the streamed stale row a no-op (the
    # caller's valid-mask contract)
    ncv, npan, V, br, r = data
    K = 8
    idx = np.array([3, 5, 7, 9, 0, 0, 0, 0], np.int32)
    s = np.array([0.5, -1.0, 2.0, 0.25, 0.0, 0.0, 0.0, 0.0], np.float32)
    upd = pallas_sel.make_sel_update(K, ncv, npan, "float32", "float32",
                                     panels=8, interpret=True)
    r2 = np.asarray(upd(jnp.asarray(idx), jnp.asarray(s), jnp.asarray(r),
                        jnp.asarray(V)))
    ref = r - np.einsum("k,kx->x", s[:4], V[idx[:4]].reshape(4, -1))
    np.testing.assert_allclose(r2, ref, rtol=1e-4, atol=1e-4)


def test_bf16_storage(data):
    ncv, npan, V, br, r = data
    K = 8
    idx = np.random.default_rng(3).permutation(ncv)[:K].astype(np.int32)
    Vb = jnp.asarray(V).astype(jnp.bfloat16)
    proj = pallas_sel.make_sel_proj(K, ncv, npan, "bfloat16", "float32",
                                    panels=8, interpret=True)
    s = np.asarray(proj(jnp.asarray(idx), Vb, jnp.asarray(br)))
    ref = np.array([np.asarray(Vb[i], np.float32).reshape(-1) @ br
                    for i in idx])
    np.testing.assert_allclose(s, ref, rtol=1e-2, atol=1e-1)
