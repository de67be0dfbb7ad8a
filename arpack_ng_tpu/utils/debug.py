"""Structured per-module trace system: the equivalent of arpack-ng's
``/debug/`` common block (debug.h:8-16, semantics in DOCUMENTS/debug.doc).

The reference exposes one message-level integer per routine family
(``mgetv0, msaupd, msaup2, msaitr, mseigt, msapps, msgets, mseupd`` and the
``mn*``/``mc*`` non-symmetric/complex twins) plus an output unit ``logfil``
and print width ``ndigit``, settable from C via ``debug_c()``
(ICB/debug_c.h:6-9).

Here the same knobs exist as a module-level :class:`DebugConfig`; tracing is
plain-Python (host-side, between jitted phases) so it costs nothing when
disabled and never perturbs compiled code.  Vector/matrix dumps mirror the
``ivout/dvout/dmout`` printers of UTIL/ (UTIL/dvout.f, UTIL/dmout.f).
"""
from __future__ import annotations

import dataclasses
import sys
from typing import Any

import numpy as np


@dataclasses.dataclass
class DebugConfig:
    logfil: Any = None     # file-like; None -> stderr (reference default: unit 6)
    ndigit: int = 6        # print precision (reference: -3 -> 72-col, 6 digits)
    mgetv0: int = 0
    maupd: int = 0         # msaupd/mnaupd/mcaupd collapsed (dtype-parametric)
    maup2: int = 0
    maitr: int = 0
    meigt: int = 0
    mapps: int = 0
    mgets: int = 0
    meupd: int = 0

    def set_all(self, level: int) -> None:
        for f in dataclasses.fields(self):
            if f.name.startswith("m"):
                setattr(self, f.name, level)


#: Global debug configuration (the ``/debug/`` common-block analog).
debug = DebugConfig()


def _out():
    return debug.logfil if debug.logfil is not None else sys.stderr


def ivout(label: str, values) -> None:
    """Integer vector print (UTIL/ivout.f analog)."""
    vals = np.atleast_1d(np.asarray(values))
    print(f" {label}\n   " + "  ".join(str(int(v)) for v in vals),
          file=_out())


def dvout(label: str, values) -> None:
    """Real/complex vector print (UTIL/dvout.f / UTIL/zvout.f analog)."""
    vals = np.atleast_1d(np.asarray(values))
    with np.printoptions(precision=debug.ndigit, suppress=False):
        print(f" {label}\n   {vals}", file=_out())


def dmout(label: str, mat) -> None:
    """Matrix print (UTIL/dmout.f analog)."""
    with np.printoptions(precision=debug.ndigit, suppress=False):
        print(f" {label}\n{np.asarray(mat)}", file=_out())


def trace(level: int, threshold: int, label: str, values=None) -> None:
    """Emit ``label`` (and optionally a vector) when ``level > threshold``."""
    if level > threshold:
        if values is None:
            print(f" {label}", file=_out())
        else:
            dvout(label, values)


def device_trace(level: int, threshold: int, fmt: str, **kw) -> None:
    """In-trace print hook for the FUSED (whole-loop-on-device) drivers:
    the analog of the msaup2-gated dvout dumps inside dsaup2's restart loop
    (SRC/dsaup2.f:404-413, :494-504), which the hybrid driver's host-side
    :func:`trace` cannot reach because the fused cycle never returns to the
    host.

    The gate is evaluated at TRACE time (solver construction): when the
    level is off this emits nothing into the compiled program — zero cost,
    identical XLA graph.  When on, it lowers to a ``jax.debug.print``
    host callback per cycle.  Set levels on :data:`debug` BEFORE
    constructing the solver object (reconstruct to change)."""
    if level > threshold:
        import jax
        jax.debug.print(fmt, **kw)
