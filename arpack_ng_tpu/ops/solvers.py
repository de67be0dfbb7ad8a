"""Device-resident iterative linear solvers for matrix-free shift-invert.

The reference's C++ layer offers a mode-solver menu — direct (LU/QR/LLT/
LDLT) and iterative (CG/BiCG with diagonal or ILU preconditioning) — used
to apply ``inv(A - sigma*B)`` inside the RCI loop (arpackSolver.hpp
template parameter SLV; arpackmm.cpp:445-476 ``--slv CG|BiCG|LU|QR...``).

Here the iterative members run fully on device as jit-traceable
``lax.while_loop`` Krylov iterations (they are traced *inside* the
eigensolver's Arnoldi step, so an entire inner solve fuses into the outer
jitted cycle with zero host involvement):

* :func:`cg`        — conjugate gradients (SPD shifted systems)
* :func:`bicgstab`  — BiCGSTAB for non-symmetric systems (the reference
                      pairs BiCG with nonsym problems)
* diagonal (Jacobi) preconditioning, the reference's ``Diag`` option.

Direct dense solves are in ops/transforms.py (host-factored explicit
inverse applied as a device GEMM); banded direct solves in ops/banded.py.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax


def _vdot(a, b):
    return jnp.vdot(a, b)


def cg(matvec: Callable, b: jax.Array, *, x0=None, tol: float = 1e-8,
       maxiter: int = 1000, precond: Optional[Callable] = None) -> jax.Array:
    """Jit-traceable conjugate gradients: solves ``matvec(x) = b``."""
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - matvec(x)
    z = precond(r) if precond is not None else r
    p = z
    rz = _vdot(r, z)
    bnorm = jnp.sqrt(jnp.abs(_vdot(b, b)))
    atol2 = (tol * bnorm) ** 2

    def cond(c):
        x, r, z, p, rz, it = c
        return (jnp.abs(_vdot(r, r)) > atol2) & (it < maxiter)

    def body(c):
        x, r, z, p, rz, it = c
        ap = matvec(p)
        alpha = rz / _vdot(p, ap)
        x = x + alpha * p
        r = r - alpha * ap
        z = precond(r) if precond is not None else r
        rz_new = _vdot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, z, p, rz_new, it + 1)

    x, *_ = lax.while_loop(cond, body, (x, r, z, p, rz, jnp.int32(0)))
    return x


def bicgstab(matvec: Callable, b: jax.Array, *, x0=None, tol: float = 1e-8,
             maxiter: int = 1000,
             precond: Optional[Callable] = None) -> jax.Array:
    """Jit-traceable BiCGSTAB for general (non-symmetric) systems."""
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - matvec(x)
    rhat = r
    rho = alpha = omega = jnp.ones((), b.dtype)
    v = p = jnp.zeros_like(b)
    bnorm = jnp.sqrt(jnp.abs(_vdot(b, b)))
    atol2 = (tol * bnorm) ** 2

    def cond(c):
        x, r, rhat, rho, alpha, omega, v, p, it = c
        return (jnp.abs(_vdot(r, r)) > atol2) & (it < maxiter)

    def body(c):
        x, r, rhat, rho, alpha, omega, v, p, it = c
        rho_new = _vdot(rhat, r)
        beta = (rho_new / rho) * (alpha / omega)
        p = r + beta * (p - omega * v)
        ph = precond(p) if precond is not None else p
        v = matvec(ph)
        alpha = rho_new / _vdot(rhat, v)
        s = r - alpha * v
        sh = precond(s) if precond is not None else s
        t = matvec(sh)
        omega = _vdot(t, s) / _vdot(t, t)
        x = x + alpha * ph + omega * sh
        r = s - omega * t
        return (x, r, rhat, rho_new, alpha, omega, v, p, it + 1)

    x, *_ = lax.while_loop(
        cond, body, (x, r, rhat, rho, alpha, omega, v, p, jnp.int32(0)))
    return x


def jacobi_preconditioner(diag: jax.Array) -> Callable:
    """The reference's ``Diag`` preconditioner option (arpackmm ``--slv
    CG`` default dsIlu... menu, arpackmm.cpp:449-466)."""
    safe = jnp.where(diag == 0, jnp.ones_like(diag), diag)
    inv = 1.0 / safe

    def precond(r):
        return inv * r

    return precond


def make_iterative_solve(matvec: Callable, *, symmetric: bool,
                         tol: float = 1e-10, maxiter: int = 1000,
                         precond: Optional[Callable] = None) -> Callable:
    """Wrap a shifted matvec ``v -> (A - sigma M) v`` into a traceable
    ``solve(b)`` suitable for :func:`ops.transforms.shift_invert_operator`."""
    inner = cg if symmetric else bicgstab
    return partial(inner, matvec, tol=tol, maxiter=maxiter, precond=precond)
