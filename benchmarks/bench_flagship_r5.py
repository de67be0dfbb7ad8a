"""Round-5 flagship A/B: the two builder-measured levers of the
round-4 verdict (#1), end-to-end on the real chip, value-checked.

Variants on the n=1M 2-D Laplacian flagship (ncv=32, nev=8, floor-tol
windows, pinned precision):

  base           implicit restart, take-path eta-subset events
                 (BENCH_r04 configuration)
  pallas-ev      implicit restart, scalar-prefetch Pallas event kernels
                 (ops/pallas_sel.py — kills the take path's ~150 us
                 gather-materialization cost, keeps ~90 us of measured
                 pallas launch overhead)
  thick          thick restart + re-tridiagonalization (device_sym
                 _retridiagonalize — replaces the 24-shift QR chase
                 scan, 2-3 ms/cycle of (32,32)-op latency), take events
  thick+pallas   both levers
  +clean         pair_rule='clean' on the better restart variant

Every variant is VALUE-CHECKED: converged Ritz values must sit below
the true lambda_max < 8 of the Laplacian and match the base variant to
f32 accuracy (the round-4 ghost-Ritz lesson: timing-only TPU benches
hid unsound arithmetic for three rounds).

Also runs the on-TPU equivalence check of the aliased rotation kernel
(advisor round-4 finding: its aliasing safety was only interpret-mode
tested).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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

    from arpack_ng_tpu import models
    from arpack_ng_tpu.config import IRAMConfig
    from arpack_ng_tpu.core.device_sym import FusedSymSolver

    # ---- rotation-kernel on-TPU value check (advisor finding) ----------
    from arpack_ng_tpu.ops import pallas_rot
    if jax.default_backend() == "tpu":
        rng = np.random.default_rng(5)
        ncv_r, npan_r, rows_r = 32, 256, 16
        q = rng.standard_normal((ncv_r, rows_r)).astype(np.float32)
        Vr = rng.standard_normal((ncv_r, npan_r, 128)).astype(np.float32)
        kern = pallas_rot.make_rotate_rows(ncv_r, rows_r, npan_r,
                                           "float32", "float32")
        out = np.asarray(jax.device_get(
            jax.jit(kern)(jnp.asarray(q), jnp.asarray(Vr))))
        ref = np.einsum("kr,kpl->rpl", q, Vr)
        err = np.max(np.abs(out[:rows_r] - ref)) / np.max(np.abs(ref))
        tail = np.max(np.abs(out[rows_r:] - Vr[rows_r:]))
        status = "OK" if (err < 1e-5 and tail == 0.0) else "MISMATCH"
        print(f"# rotate_rows on-TPU value check: {status} "
              f"(err={err:.2e}, untouched-tail delta={tail:.2e})",
              flush=True)

    nx = 1024
    ncv, nev = 32, 8
    dtype = np.float32
    target_cycles = 40
    op, _ = models.laplacian_2d(nx, dtype=dtype)

    def make_solver(restart, pallas_ev, pair_rule="always", tol=1e-30):
        if pallas_ev:
            os.environ.pop("ARPACK_TPU_NO_PALLAS_SEL", None)
        else:
            os.environ["ARPACK_TPU_NO_PALLAS_SEL"] = "1"
        cfg = IRAMConfig(n=op.n, nev=nev, ncv=ncv, which="LA",
                         symmetric=True, dtype=np.dtype(dtype), tol=tol,
                         n_pad=op.n_pad, max_iter=10_000,
                         reorth="selective", restart=restart,
                         pair_rule=pair_rule)
        return FusedSymSolver(op, cfg)

    def measure(solver):
        state = solver.init_state(jax.random.key(123))
        out = solver._multi(state, jnp.int32(2), jnp.int32(10_000))
        float(jax.device_get(out.state.rnorm))
        tot = dict(dt=0.0, cycles=0, matvecs=0, refines=0, selr=0,
                   vmax=-1e30)
        seed = 1000
        while tot["cycles"] < target_cycles:
            state = solver.init_state(jax.random.key(seed))
            seed += 1
            c0 = jax.device_get(state.counts)
            it0 = int(jax.device_get(state.iter))
            t0 = time.perf_counter()
            out = solver._multi(state, jnp.int32(target_cycles),
                                jnp.int32(10_000))
            float(jax.device_get(out.state.rnorm))
            dt = time.perf_counter() - t0
            c1 = jax.device_get(out.state.counts)
            tot["dt"] += dt
            tot["cycles"] += int(jax.device_get(out.state.iter)) - it0
            tot["matvecs"] += int(c1.nopx) - int(c0.nopx)
            tot["refines"] += int(c1.nrorth) - int(c0.nrorth)
            tot["selr"] += int(c1.nrorthr) - int(c0.nrorthr)
            rs = np.asarray(jax.device_get(out.ritz_s), np.float64)
            tot["vmax"] = max(tot["vmax"], float(np.max(rs)))
        return tot

    variants = [
        ("base (implicit, take-ev)", dict(restart="implicit",
                                          pallas_ev=False)),
        ("pallas-ev", dict(restart="implicit", pallas_ev=True)),
        ("thick-retrid (take-ev)", dict(restart="thick",
                                        pallas_ev=False)),
        ("thick+pallas-ev", dict(restart="thick", pallas_ev=True)),
        ("thick+pallas+clean", dict(restart="thick", pallas_ev=True,
                                    pair_rule="clean")),
        ("implicit+pallas+clean", dict(restart="implicit",
                                       pallas_ev=True,
                                       pair_rule="clean")),
    ]
    results = {}
    for name, kw in variants:
        t0 = time.perf_counter()
        s = make_solver(**kw)
        res = measure(s)
        results[name] = res
        per_mv = res["dt"] / max(res["matvecs"], 1)
        vok = "SOUND" if res["vmax"] < 8.0 + 1e-3 else \
            f"GHOST({res['vmax']:.2f})"
        print(f"{name:28s} wall={res['dt']*1e3:7.1f} ms  "
              f"cycles={res['cycles']:3d} matvecs={res['matvecs']:5d} "
              f"per-mv={per_mv*1e3:5.3f} ms  events={res['refines']:4d} "
              f"selrows={res['selr']:5d}  vmax={res['vmax']:.4f} "
              f"[{vok}]  (total incl. compile "
              f"{time.perf_counter()-t0:.0f}s)", flush=True)

    base = results["base (implicit, take-ev)"]
    for name, res in results.items():
        sp = (base["dt"] / max(base["matvecs"], 1)) / \
            (res["dt"] / max(res["matvecs"], 1))
        print(f"# {name:28s} speedup-per-matvec vs base: {sp:.3f}x",
              flush=True)


if __name__ == "__main__":
    main()
