"""Fully device-fused non-symmetric/complex restart cycle: the whole
znaupd-class major iteration as one XLA computation — and, via
complexification, a fused path for real non-symmetric problems too.

The hybrid driver computes the reduced-space Hessenberg eigenproblem on
the host (LAPACK), costing several host<->device syncs per restart cycle.
Here the reduced space runs on device:

* **Schur form** of the (ncv, ncv) Hessenberg via a single-shift complex
  QR iteration with Wilkinson shifts: each sweep takes one explicit QR of
  ``H - mu I`` (mu from the trailing active 2x2), applies the unitary
  similarity, re-truncates to Hessenberg and deflates negligible
  subdiagonals; a ``lax.scan`` of a fixed sweep budget (compiled once)
  replaces dlahqr (SRC/dneigh.f:194).  Working in complex arithmetic
  removes the double-shift bookkeeping of the real Francis iteration —
  the trade the reference's authors note as "simpler, 2x flops"
  (SURVEY hard-parts #3); on the MXU the extra flops are noise while the
  removed host round trips are the dominant cost.
* **Ritz bounds** (dneigh's rnorm * |last eigenvector component|) via
  batched masked triangular solves for the eigenvectors of the Schur
  factor, guarded like dtrevc's smallnum clamps.
* Shift selection / convergence / nev inflation with masks, and the
  implicit-shift chase as a scan of complex QRs (znapps equivalent),
  exactly parallel to core/device_sym.py.

Real problems use :func:`complexify_operator`: the real operator is
applied separately to Re/Im parts (2 real matvecs per complex matvec),
V is stored complex.  Eigenvalues of the real matrix appear in conjugate
pairs exactly as the reference returns them.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..config import IRAMConfig
from ..ops.operator import Operator
from ..utils import dtypes as _dt
from ..utils.debug import debug, device_trace
from ..utils.hoist import hoisted_jit
from ..utils.precision import hiprec
from ..utils.stats import SolverStats, Timers
from . import reduced
from .arnoldi import (FactorizationState, make_bnorm, make_extend,
                      make_init, rotate_basis_kev, v_is_3d)
from .device_sym import CycleOut
from .iram import IRAMResult

#: QR-iteration sweep budget per cycle, in units of ncv (Wilkinson-shifted
#: single-shift QR converges in ~2-3 sweeps per eigenvalue).
_SWEEPS_PER_EV = 4


def complexify_operator(op: Operator) -> Operator:
    """Lift a real-dtype operator to complex arithmetic (A applied to the
    real and imaginary parts independently)."""
    if _dt.is_complex(op.dtype):
        return op
    cdt = np.dtype(np.complex64 if op.dtype == np.float32
                   else np.complex128)

    def lift1(fn):
        if fn is None:
            return None

        def g(v):
            return fn(v.real) + 1j * fn(v.imag)

        return g

    def apply(v, bv):
        wr, bwr = op.apply(v.real, bv.real)
        wi, bwi = op.apply(v.imag, bv.imag)
        return wr + 1j * wi, bwr + 1j * bwi

    return Operator(n=op.n, dtype=cdt, apply=apply, bmat=op.bmat,
                    mode=op.mode, b_apply=lift1(op.b_apply) if
                    op.bmat == "G" else None,
                    a_apply=lift1(op.a_apply), m_apply=lift1(op.m_apply),
                    n_pad=op.n_pad, sigma=op.sigma, hermitian=False,
                    perm=op.perm)


def _which_key_cplx(which: str, vals):
    if which == "LM":
        return jnp.abs(vals)
    if which == "SM":
        return -jnp.abs(vals)
    if which == "LR":
        return vals.real
    if which == "SR":
        return -vals.real
    if which == "LI":
        return vals.imag
    if which == "SI":
        return -vals.imag
    raise ValueError(f"bad which={which!r}")


def make_hessenberg_schur(k: int, cdt, sweeps: int):
    """Device Schur decomposition of a complex Hessenberg matrix:
    returns (T upper-triangular, Q unitary with H = Q T Q^H)."""
    rdt = _dt.real_dtype(cdt)
    eps = jnp.asarray(_dt.eps(cdt), rdt)
    eye = jnp.eye(k, dtype=cdt)
    idx1 = jnp.arange(k - 1)

    def deflate(T):
        sub = jnp.diag(T, -1)
        big = jnp.abs(jnp.diag(T)[:-1]) + jnp.abs(jnp.diag(T)[1:])
        big = jnp.where(big == 0, jnp.ones_like(big), big)
        keep = jnp.abs(sub) > eps * big
        sub2 = jnp.where(keep, sub, jnp.zeros_like(sub))
        return (jnp.triu(T, 0) + jnp.diag(sub2, -1)), keep

    def sweep(carry, _):
        T, Q = carry
        T, keep = deflate(T)
        any_active = jnp.any(keep)
        # trailing active 2x2: largest i with keep[i]
        m = jnp.max(jnp.where(keep, idx1, -1))
        m = jnp.maximum(m, 0)
        # trailing active 2x2 block (dynamic)
        blk = lax.dynamic_slice(T, (m, m), (2, 2))
        a11, a12 = blk[0, 0], blk[0, 1]
        a21, a22 = blk[1, 0], blk[1, 1]
        tr = a11 + a22
        det = a11 * a22 - a12 * a21
        disc = jnp.sqrt(tr * tr / 4.0 - det)
        mu1 = tr / 2.0 + disc
        mu2 = tr / 2.0 - disc
        mu = jnp.where(jnp.abs(mu1 - a22) < jnp.abs(mu2 - a22), mu1, mu2)

        def do(TQ):
            T, Q = TQ
            q, _ = jnp.linalg.qr(T - mu * eye)
            Tn = q.conj().T @ T @ q
            Tn = jnp.triu(Tn, -1)          # re-Hessenberg
            return Tn, Q @ q

        T, Q = lax.cond(any_active, do, lambda TQ: TQ, (T, Q))
        return (T, Q), None

    def schur(H):
        (T, Q), _ = lax.scan(sweep, (H.astype(cdt), eye), None,
                             length=sweeps)
        T, _ = deflate(T)
        return T, Q

    return schur


def make_last_components(k: int, cdt):
    """Given the Schur pair (T, Q) of H, return for every eigenvalue
    lambda_i = T[i,i] the modulus of the LAST component of the unit
    eigenvector of H — the quantity dneigh feeds the Ritz bounds.

    Eigenvector of T for lambda_i: z[0:i] solves
    (T[0:i,0:i] - lambda_i) u = -T[0:i, i], z[i] = 1, z[j>i] = 0 —
    realized as full-size masked triangular solves batched over i, with
    dtrevc-style smallnum clamping of near-singular diagonals."""
    rdt = _dt.real_dtype(cdt)
    eps = _dt.eps(cdt)
    iota = jnp.arange(k)

    def last_comps(T, Q):
        tnorm = jnp.maximum(jnp.max(jnp.abs(T)), 1.0)
        small = jnp.asarray(eps, rdt) * tnorm
        lam = jnp.diag(T)

        def one(i):
            mask_lt = iota < i
            # M = T - lam_i I with rows/cols >= i neutralized to identity
            M = T - lam[i] * jnp.eye(k, dtype=cdt)
            M = jnp.where(mask_lt[:, None] & mask_lt[None, :], M,
                          jnp.where((iota[:, None] == iota[None, :]),
                                    jnp.ones((), cdt), jnp.zeros((), cdt)))
            # clamp near-singular diagonal (degenerate eigenvalues)
            d = jnp.diag(M)
            dmag = jnp.abs(d)
            d_safe = jnp.where(dmag < small,
                               jnp.asarray(small, rdt).astype(cdt), d)
            M = M - jnp.diag(d) + jnp.diag(d_safe)
            rhs = jnp.where(mask_lt, -T[:, i], jnp.zeros((), cdt))
            u = jax.lax.linalg.triangular_solve(
                M, rhs[:, None], left_side=True, lower=False)[:, 0]
            z = jnp.where(mask_lt, u, jnp.zeros((), cdt))
            z = z.at[i].set(jnp.ones((), cdt))
            znorm = jnp.sqrt(jnp.abs(jnp.vdot(z, z)))
            w = Q[k - 1, :] @ z
            return jnp.abs(w) / znorm

        return jax.vmap(one)(iota)

    return last_comps


def make_cplx_cycle(op: Operator, cfg: IRAMConfig):
    """Jitted fused cycle for complex-arithmetic problems:
    (state, is_last) -> CycleOut."""
    if cfg.symmetric:
        raise ValueError("use device_sym for symmetric problems")
    if not _dt.is_complex(cfg.dtype):
        raise ValueError("complex dtype required (complexify the operator)")
    ncv, nev0 = cfg.ncv, cfg.nev
    np0 = ncv - nev0
    cdt = jnp.dtype(cfg.dtype)
    rdt = _dt.real_dtype(cdt)
    tol = jnp.asarray(cfg.tol_effective, rdt)
    eps23 = jnp.asarray(cfg.eps23, rdt)
    eps_m = jnp.asarray(_dt.eps(cdt), rdt)
    extend = make_extend(op, cfg)
    bnorm = make_bnorm(op, cfg)
    is_g = op.bmat == "G"
    iota = jnp.arange(ncv)
    schur = make_hessenberg_schur(ncv, cdt, sweeps=_SWEEPS_PER_EV * ncv)
    last_comps = make_last_components(ncv, cdt)
    eyek = jnp.eye(ncv, dtype=cdt)

    def cycle(state: FactorizationState, is_last) -> CycleOut:
        state = extend(state, jnp.int32(ncv))

        # ---- dneigh: Schur + Ritz values + bounds ----
        T, Qs = schur(state.H)
        lam = jnp.diag(T)
        bounds = (state.rnorm * last_comps(T, Qs)).astype(rdt)

        # ---- dngets: wanted last ----
        order = jnp.argsort(_which_key_cplx(cfg.which, lam))
        r_s, b_s = lam[order], bounds[order]

        # ---- dnconv over the nev0 wanted ----
        wanted, wb = r_s[np0:], b_s[np0:]
        nconv = jnp.sum(
            wb <= tol * jnp.maximum(eps23, jnp.abs(wanted))
        ).astype(jnp.int32)

        nz = jnp.sum(b_s[:np0] == 0).astype(jnp.int32)
        np_eff = jnp.int32(np0) - nz
        nev_eff = jnp.int32(nev0) + nz
        done = (nconv >= nev0) | (np_eff == 0)

        # mcaup2-gated per-cycle dumps (SRC/znaup2.f analog)
        device_trace(debug.maup2, 0,
                     "_cplx_cycle: iter {i}: nconv={nc} rnorm={rn}",
                     i=state.iter, nc=nconv, rn=state.rnorm)
        device_trace(debug.maup2, 1,
                     "_cplx_cycle: ritz (wanted last) {r}\n"
                     "_cplx_cycle: bounds {b}", r=r_s, b=b_s)

        nev_inf = nev_eff + jnp.minimum(nconv, np_eff // 2)
        nev_inf = jnp.where((nev_inf == 1) & (ncv >= 6), ncv // 2,
                            jnp.where((nev_inf == 1) & (ncv > 3), 2,
                                      nev_inf))
        nev_eff = jnp.minimum(nev_inf, ncv - 1)
        np_eff = jnp.int32(ncv) - nev_eff

        def apply_shifts(args):
            state, r_s, b_s, nev_eff, np_eff = args
            active0 = iota < np_eff
            skey = jnp.where(active0[:np0], -jnp.abs(b_s[:np0]),
                             jnp.asarray(jnp.inf, rdt))
            sperm = jnp.argsort(skey)
            shifts = r_s[:np0][sperm]
            active = active0[:np0]

            def chase(carry, inp):
                Hc, Qc = carry
                mu, act = inp

                def do(HQ):
                    Hc, Qc = HQ
                    q, _ = jnp.linalg.qr(Hc - mu * eyek)
                    Hn = jnp.triu(q.conj().T @ Hc @ q, -1)
                    # deflation (dnapps.f:328-336)
                    sub = jnp.diag(Hn, -1)
                    big = (jnp.abs(jnp.diag(Hn)[:-1])
                           + jnp.abs(jnp.diag(Hn)[1:]))
                    big = jnp.where(big == 0, jnp.ones_like(big), big)
                    sub = jnp.where(jnp.abs(sub) <= eps_m * big,
                                    jnp.zeros_like(sub), sub)
                    Hn = jnp.triu(Hn, 0) + jnp.diag(sub, -1)
                    return Hn, Qc @ q

                return lax.cond(act, do, lambda HQ: HQ, (Hc, Qc)), None

            (Hc, Q), _ = lax.scan(chase, (state.H, eyek), (shifts, active))
            sigmak = Q[ncv - 1, nev_eff - 1]
            betak_row = lax.dynamic_index_in_dim(Hc, nev_eff, axis=0,
                                                 keepdims=False)
            betak = betak_row[nev_eff - 1]
            # dsapps-parity kev-row update (SRC/znapps.f analog)
            VQ, v_next, rots = rotate_basis_kev(Q, state.V, nev_eff, cdt)
            v_next = v_next.reshape(-1).astype(cdt)
            resid = sigmak * state.resid + betak * v_next
            b_resid = op.b_apply(resid) if is_g else resid
            counts = state.counts.add(nbx=jnp.int32(1 if is_g else 0),
                                      nrotr=rots)
            rnorm = bnorm(resid, b_resid).astype(rdt)
            return state._replace(V=VQ, H=Hc, resid=resid,
                                  b_resid=b_resid, rnorm=rnorm, k=nev_eff,
                                  nev_cur=nev_eff, iter=state.iter + 1,
                                  counts=counts)

        def skip_shifts(args):
            state = args[0]
            return state._replace(iter=state.iter + 1)

        state = lax.cond(done | is_last, skip_shifts, apply_shifts,
                         (state, r_s, b_s, nev_eff, np_eff))
        return CycleOut(state=state, done=done, nconv=nconv,
                        ritz_s=r_s, bounds_s=b_s)

    return hiprec(cycle)


def make_cplx_multi_cycle(op: Operator, cfg: IRAMConfig):
    """lax.while_loop over the fused complex cycle (one dispatch for the
    whole restart loop; see device_sym.make_sym_multi_cycle)."""
    cycle = make_cplx_cycle(op, cfg)
    ncv = cfg.ncv
    cdt = jnp.dtype(cfg.dtype)
    rdt = _dt.real_dtype(cdt)

    def multi(state: FactorizationState, n_cycles, iter_limit) -> CycleOut:
        out0 = CycleOut(state=state, done=jnp.bool_(False),
                        nconv=jnp.int32(0),
                        ritz_s=jnp.zeros((ncv,), cdt),
                        bounds_s=jnp.zeros((ncv,), rdt))

        def cond(c):
            out, j = c
            return ((~out.done) & (j < n_cycles)
                    & (out.state.iter < iter_limit)
                    & (out.state.info == 0))

        def body(c):
            out, j = c
            is_last = out.state.iter + 1 >= iter_limit
            return cycle(out.state, is_last), j + 1

        out, _ = lax.while_loop(cond, body, (out0, jnp.int32(0)))
        return out

    return multi


class FusedNonsymSolver:
    """znaupd-equivalent driver over the fused complex cycle; also serves
    real non-symmetric problems via complexification."""

    def __init__(self, op: Operator, cfg: IRAMConfig, mesh=None,
                 cycles_per_dispatch: int = 16):
        if not _dt.is_complex(cfg.dtype):
            raise ValueError(
                "FusedNonsymSolver needs a complex dtype; use "
                "complexify_operator + a complex IRAMConfig for real input")
        self.op, self.cfg, self.mesh = op, cfg, mesh
        self.cycles_per_dispatch = cycles_per_dispatch
        if not cfg.exact_shifts:
            raise ValueError("fused path requires exact shifts")
        init = make_init(op, cfg, v3d=v_is_3d(cfg, mesh))
        multi = make_cplx_multi_cycle(op, cfg)
        if mesh is None:
            # hoisted_jit keeps operator data (dense/DIA/banded/ILU
            # arrays) out of the lowered module (utils/hoist.py)
            self._init_rand = hoisted_jit(lambda key: init(key, None))
            self._init_v0 = hoisted_jit(init)
            self._multi = hoisted_jit(multi, donate_argnums=(0,))
        else:
            from ..parallel.sharding import replicated, state_shardings
            st_sh = state_shardings(mesh, v3d=v_is_3d(cfg, mesh))
            rep = replicated(mesh)
            out_sh = CycleOut(state=st_sh, done=rep, nconv=rep,
                              ritz_s=rep, bounds_s=rep)
            self._init_rand = jax.jit(lambda key: init(key, None),
                                      in_shardings=(rep,),
                                      out_shardings=st_sh)
            self._init_v0 = jax.jit(init, in_shardings=(rep, st_sh.resid),
                                    out_shardings=st_sh)
            self._multi = jax.jit(multi, donate_argnums=(0,),
                                  in_shardings=(st_sh, rep, rep),
                                  out_shardings=out_sh)

    def init_state(self, key=None, v0=None) -> FactorizationState:
        if key is None:
            key = jax.random.key(self.cfg.seed)
        if v0 is None:
            return self._init_rand(key)
        v0 = np.asarray(v0)
        if getattr(self.op, "perm", None) is not None \
                and v0.shape[0] == self.cfg.n:
            v0 = v0[np.asarray(self.op.perm)]
        if v0.shape[0] == self.cfg.n and self.cfg.n_pad != self.cfg.n:
            v0p = np.zeros((self.cfg.n_pad,), v0.dtype)
            v0p[: self.cfg.n] = v0
            v0 = v0p
        return self._init_v0(key, jnp.asarray(v0, self.cfg.dtype))

    def solve(self, key=None, v0=None, state=None) -> IRAMResult:
        cfg = self.cfg
        timers = Timers()
        with timers.timed("taupd"):
            if state is None:
                with timers.timed("tgetv0"):
                    state = self.init_state(key=key, v0=v0)
            if int(jax.device_get(state.info)) < 0:
                z = np.zeros(cfg.ncv)
                return self._result(state, z, z, 0, int(state.info), 0,
                                    timers)
            out = None
            it = 0
            while True:
                with timers.timed("taitr"):
                    out = self._multi(state,
                                      jnp.int32(self.cycles_per_dispatch),
                                      jnp.int32(cfg.max_iter))
                    state = out.state
                    done = bool(jax.device_get(out.done))
                it = int(jax.device_get(state.iter))
                info = int(jax.device_get(state.info))
                if info != 0:
                    return self._result(state, np.zeros(cfg.ncv),
                                        np.zeros(cfg.ncv), 0,
                                        -9999 if info > 0 else info, it,
                                        timers)
                if done or it >= cfg.max_iter:
                    break
        nconv = int(jax.device_get(out.nconv))
        r_s = np.asarray(jax.device_get(out.ritz_s)).astype(np.complex128)
        b_s = np.asarray(jax.device_get(out.bounds_s)).astype(np.float64)
        r_x, b_x = reduced.exit_sort(cfg.which, cfg.nev, nconv, r_s.copy(),
                                     b_s.copy(), cfg.eps23, False, False)
        info = 0
        if it >= cfg.max_iter and nconv < cfg.nev:
            info = 1
        return self._result(state, r_x, b_x, nconv, info, it, timers)

    def _result(self, state, ritz, bounds, nconv, info, n_iter, timers
                ) -> IRAMResult:
        stats = SolverStats(n_iter=n_iter, n_conv=nconv, timers=timers)
        stats.absorb_counts(jax.device_get(state.counts))
        return IRAMResult(ritz=ritz, bounds=bounds, nconv=nconv, info=info,
                          n_iter=n_iter, state=state, stats=stats)
