"""arpackmm-equivalent command-line interface.

Flag vocabulary follows EXAMPLES/MATRIX_MARKET/arpackmm.cpp:104-292
(--A/--B .mtx inputs, --nonSymPb/--cpxPb/--genPb problem kinds, --nbEV/
--nbCV, --mag LM|SM|LA|SA|LR|SR|LI|SI, --shiftReal/--shiftImag, --invert,
--tol/--maxIt, --schur, --slv, --restart/--dump, --dense, --simplePrec,
--verbose/--debug), so reference users can port their command lines.

Usage:
    python -m arpack_ng_tpu.cli --A A.mtx --nbEV 4 --mag LM
    python -m arpack_ng_tpu.cli --A K.mtx --B M.mtx --genPb --shiftReal 1.0
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="arpack_ng_tpu.cli",
        description="TPU-native eigensolver CLI (arpackmm equivalent)")
    p.add_argument("--A", required=True, help="MatrixMarket file for A")
    p.add_argument("--B", default=None, help="MatrixMarket file for B/M")
    p.add_argument("--nonSymPb", action="store_true",
                   help="treat the problem as non-symmetric")
    p.add_argument("--cpxPb", action="store_true",
                   help="complex arithmetic problem")
    p.add_argument("--genPb", action="store_true",
                   help="generalized problem A x = lambda B x")
    p.add_argument("--nbEV", type=int, default=1, help="eigenvalues wanted")
    p.add_argument("--nbCV", type=int, default=None,
                   help="Krylov subspace size (ncv)")
    p.add_argument("--mag", default="LM",
                   help="which: LM|SM|LA|SA|BE|LR|SR|LI|SI")
    p.add_argument("--shiftReal", type=float, default=None)
    p.add_argument("--shiftImag", type=float, default=None)
    p.add_argument("--invert", action="store_true",
                   help="shift-invert mode (with --shiftReal/Imag)")
    p.add_argument("--tol", type=float, default=1e-6)
    p.add_argument("--maxIt", type=int, default=500)
    p.add_argument("--schur", action="store_true",
                   help="compute Schur basis instead of Ritz vectors")
    p.add_argument("--noEV", action="store_true",
                   help="eigenvalues only (skip vectors)")
    p.add_argument("--slv", default="LU",
                   help="mode solver: LU (direct dense) | CG | BiCG")
    p.add_argument("--slvTol", type=float, default=1e-10,
                   help="iterative mode-solver tolerance")
    p.add_argument("--slvMaxIt", type=int, default=2000)
    p.add_argument("--dense", action="store_true",
                   help="use dense operator storage")
    p.add_argument("--simplePrec", action="store_true",
                   help="single precision (float32/complex64)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--restart", default=None,
                   help="checkpoint file to resume from")
    p.add_argument("--dump", default=None,
                   help="write final solver state to this checkpoint file")
    p.add_argument("--verbose", type=int, default=0)
    p.add_argument("--debug", type=int, default=0,
                   help="trace level (debug_c equivalent)")
    p.add_argument("--json", action="store_true",
                   help="machine-readable output")
    p.add_argument("--cpu", action="store_true",
                   help="force CPU backend")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if not args.simplePrec:
        jax.config.update("jax_enable_x64", True)

    from . import api
    from .config import IRAMConfig, default_ncv
    from .core.extract import extract
    from .core.iram import IRAMSolver
    from .io import checkpoint as ckpt
    from .io import matrix_market as mm
    from .ops import solvers as slv_mod
    from .ops import transforms
    from .utils.debug import debug

    if args.debug:
        debug.set_all(args.debug)

    t0 = time.perf_counter()
    if args.simplePrec:
        dtype = np.complex64 if args.cpxPb else np.float32
    else:
        dtype = np.complex128 if args.cpxPb else np.float64

    a_sp = mm.read_matrix(args.A).astype(dtype)
    b_sp = mm.read_matrix(args.B).astype(dtype) if args.B else None
    sym = not (args.nonSymPb or args.cpxPb)

    sigma = None
    if args.shiftReal is not None or args.shiftImag is not None:
        sigma = complex(args.shiftReal or 0.0, args.shiftImag or 0.0)
        if sym:
            sigma = sigma.real
    if args.invert and sigma is None:
        sigma = 0.0

    # ---- build the operator ----
    if sigma is not None and args.slv in ("CG", "BiCG"):
        from .ops.sparse import from_scipy
        base = from_scipy(a_sp, hermitian=sym)
        if b_sp is not None:
            raise SystemExit("iterative generalized solves: use --slv LU")
        shifted = lambda v: base.a_apply(v) - dtype(sigma) * v
        solve = slv_mod.make_iterative_solve(
            shifted, symmetric=(args.slv == "CG"), tol=args.slvTol,
            maxiter=args.slvMaxIt)
        op = transforms.shift_invert_operator(
            base.n, dtype, solve, sigma=sigma, mode=3, n_pad=base.n_pad,
            hermitian=sym, a_apply=base.a_apply)
    elif sigma is not None or b_sp is not None:
        build = transforms.build_sym_operator if sym \
            else transforms.build_nonsym_operator
        op = build(a_sp, M=b_sp, sigma=sigma, dtype=dtype)
    else:
        if args.dense:
            from .ops.operator import from_dense
            op = from_dense(a_sp.toarray(), hermitian=sym)
        else:
            from .ops.sparse import from_scipy
            op = from_scipy(a_sp, hermitian=sym)

    ncv = args.nbCV or default_ncv(op.n, args.nbEV, sym)
    cfg = IRAMConfig(n=op.n, nev=args.nbEV, ncv=min(ncv, op.n),
                     which=args.mag, bmat=op.bmat, mode=op.mode,
                     tol=args.tol, max_iter=args.maxIt, symmetric=sym,
                     dtype=np.dtype(op.dtype), n_pad=op.n_pad,
                     seed=args.seed)
    solver = IRAMSolver(op, cfg)

    state = None
    v0 = None
    if args.restart:
        state, meta = ckpt.load_state(args.restart, cfg=None)
        if state is None:
            v0 = meta["resid"]
    res = solver.solve(v0=v0, state=state)
    if args.dump:
        ckpt.save_state(args.dump, res.state, cfg)
    if res.info < 0:
        print(f"ERROR: solver info = {res.info}", file=sys.stderr)
        return 2

    out = extract(op, cfg, res,
                  rvec=not args.noEV,
                  howmny="P" if args.schur else "A")
    elapsed = time.perf_counter() - t0

    # residual verification with an independent matvec — arpackSolver::
    # checkEigVec (arpackSolver.hpp:297-323)
    residuals = []
    if out.vectors is not None and not args.schur:
        for i in range(out.nconv):
            v = out.vectors[:, i]
            av = a_sp @ v
            bv = (b_sp @ v) if b_sp is not None else v
            residuals.append(
                float(np.linalg.norm(av - out.values[i] * bv)
                      / max(1.0, abs(out.values[i]))))

    if args.json:
        print(json.dumps({
            "nconv": out.nconv, "info": out.info, "n_iter": out.n_iter,
            "values_real": [float(v.real) for v in np.atleast_1d(out.values)],
            "values_imag": [float(np.imag(v))
                            for v in np.atleast_1d(out.values)],
            "residuals": residuals, "elapsed_s": elapsed,
        }))
    else:
        print(f"OPT: solved in {elapsed:.3f}s, {out.n_iter} restart "
              f"iterations, {out.nconv} converged (info={out.info})")
        for i, v in enumerate(np.atleast_1d(out.values)):
            line = f"  lambda[{i}] = {v}"
            if residuals:
                line += f"   ||A*x-l*B*x||/|l| = {residuals[i]:.3e}"
            print(line)
        if args.verbose:
            print(res.stats.summary())
    bad = [r for r in residuals if r > max(args.tol * 100, 1e-5)]
    return 1 if (out.nconv < args.nbEV or bad) else 0


def _main_guarded(argv=None) -> int:
    try:
        return main(argv)
    except (ValueError, FileNotFoundError) as e:
        print(f"ERROR: {e}", file=sys.stderr)
        return 2


if __name__ == "__main__":
    sys.exit(_main_guarded())
