"""On-TPU VALUE checks for every round-5 compute path — the repo rule
(CLAUDE.md): any new TPU path must be value-checked, not just timed
(the round-4 ghost-Ritz bug hid for three rounds behind timing-only
benches).

Checks (each prints OK/MISMATCH):

1. aliased kev-row rotation kernel vs the full XLA rotation
   (advisor round-4 finding — aliasing safety beyond interpret mode);
2. scalar-prefetch event kernels (proj/update/update+norm) vs the
   take-path contraction;
3. PSELL uniform-W matvec vs scipy on an irregular FEM-class matrix;
4. END-TO-END: eigsh through a PSELL-format operator vs
   scipy.sparse.linalg.eigsh (which wraps the reference) — values and
   residuals of a complete solve on the chip.

Usage: python benchmarks/check_tpu_values.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAILED = []


def report(name, ok, detail):
    tag = "OK" if ok else "MISMATCH"
    print(f"{name:46s} {tag}  ({detail})", flush=True)
    if not ok:
        FAILED.append(name)


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    rng = np.random.default_rng(11)

    # ---- 1. rotation kernel ------------------------------------------
    from arpack_ng_tpu.ops import pallas_rot
    ncv, npan, rows = 32, 256, 16
    q = rng.standard_normal((ncv, rows)).astype(np.float32)
    V = rng.standard_normal((ncv, npan, 128)).astype(np.float32)
    kern = pallas_rot.make_rotate_rows(ncv, rows, npan, "float32",
                                       "float32")
    out = np.asarray(jax.device_get(jax.jit(kern)(jnp.asarray(q),
                                                  jnp.asarray(V))))
    ref = np.einsum("kr,kpl->rpl", q, V)
    err = np.max(np.abs(out[:rows] - ref)) / np.max(np.abs(ref))
    tail = float(np.max(np.abs(out[rows:] - V[rows:])))
    report("rotate_rows (aliased kev-row kernel)",
           err < 1e-5 and tail == 0.0, f"err={err:.1e} tail={tail:.1e}")

    # ---- 2. event kernels --------------------------------------------
    from arpack_ng_tpu.ops import pallas_sel
    K = 16
    br = rng.standard_normal((npan * 128,)).astype(np.float32)
    r = rng.standard_normal((npan * 128,)).astype(np.float32)
    idx = np.sort(rng.choice(ncv, K, replace=False)).astype(np.int32)
    proj = pallas_sel.make_sel_proj(K, ncv, npan, "float32", "float32")
    updn = pallas_sel.make_sel_update(K, ncv, npan, "float32",
                                      "float32", with_norm=True)

    @jax.jit
    def ev(idxj, Vj, brj, rj):
        s = proj(idxj, Vj, brj)
        return pallas_sel_pair(idxj, s, rj, Vj)

    def pallas_sel_pair(idxj, s, rj, Vj):
        r2, nrm = updn(idxj, s, rj, Vj)
        return s, r2, nrm

    s, r2, nrm = jax.device_get(ev(jnp.asarray(idx), jnp.asarray(V),
                                   jnp.asarray(br), jnp.asarray(r)))
    s_ref = np.array([V[i].reshape(-1) @ br for i in idx], np.float32)
    r2_ref = r - np.einsum("k,kx->x", np.asarray(s),
                           V[idx].reshape(K, -1))
    e1 = np.max(np.abs(np.asarray(s) - s_ref)) / np.max(np.abs(s_ref))
    e2 = np.max(np.abs(np.asarray(r2) - r2_ref))
    e3 = abs(float(nrm) - float(r2_ref @ r2_ref)) / max(
        float(r2_ref @ r2_ref), 1e-30)
    report("event kernels (proj + update + fused norm)",
           e1 < 1e-5 and e2 < 1e-3 and e3 < 1e-5,
           f"proj={e1:.1e} upd={e2:.1e} norm={e3:.1e}")

    # ---- 3. PSELL matvec ---------------------------------------------
    from arpack_ng_tpu.models import corpus
    from arpack_ng_tpu.ops.sparse import from_scipy
    a = corpus.fem_triangulation(30_000).tocsr().astype(np.float32)
    a = ((a + a.T) * 0.5).tocsr()
    op = from_scipy(a, hermitian=True, format="psell")
    x = rng.standard_normal(a.shape[0])
    y = op.matvec(x)
    ref = a @ x.astype(np.float32)
    err = np.max(np.abs(y - ref)) / np.max(np.abs(ref))
    report("PSELL matvec vs scipy (FEM n=30k)", err < 1e-4,
           f"relerr={err:.1e}")

    # ---- 4. end-to-end PSELL eigensolve vs the reference -------------
    import scipy.sparse.linalg as sla
    import arpack_ng_tpu as at
    vals, vecs = at.eigsh(op, k=4, which="LA", ncv=20, tol=1e-4,
                          maxiter=2000)
    ref_vals = sla.eigsh(a.astype(np.float64), k=4, which="LA",
                         tol=1e-8, return_eigenvectors=False)
    verr = np.max(np.abs(np.sort(vals) - np.sort(ref_vals))
                  / np.abs(np.sort(ref_vals)))
    res = max(np.linalg.norm(a @ vecs[:, i] - vals[i] * vecs[:, i])
              / abs(vals[i]) for i in range(4))
    report("eigsh end-to-end through PSELL vs reference",
           verr < 1e-3 and res < 1e-3,
           f"value relerr={verr:.1e} resid={res:.1e}")

    print("ALL OK" if not FAILED else f"FAILURES: {FAILED}", flush=True)
    sys.exit(1 if FAILED else 0)


if __name__ == "__main__":
    main()
