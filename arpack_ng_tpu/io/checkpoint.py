"""Checkpoint / resume.

Reference protocol: the RCI state *is* the checkpoint — pass ``info != 0``
into Xsaupd with a caller-saved ``resid`` to restart (SRC/dsaupd.f:130-136,
243-246); the C++ layer wraps this as ``dumpToFile``/``restartFromFile``
(arpackSolver.hpp:153-154), the CLI as ``--restart`` (arpackmm.cpp:292,
497-500, tested by issue401.sh), and pyarpack as restart support.

Here the explicit :class:`FactorizationState` pytree is serialized whole
(resid AND the full factorization V/H + counters), which strictly dominates
the reference's resid-only restart: resuming continues mid-factorization
with zero recomputation.  ``save_resid_only=True`` reproduces the exact
reference semantics (restart = new solve seeded with the saved resid).

Dump cadence with the fused drivers: the multi-cycle drivers
(core/device_sym.py etc.) run up to ``cycles_per_dispatch`` restart cycles
inside ONE on-device while_loop, so state is host-observable — and hence
dumpable — only at dispatch boundaries (every ``cycles_per_dispatch``
cycles, or earlier on convergence).  A dump at any such boundary resumes
exactly, independent of the resuming solver's own ``cycles_per_dispatch``
(the state carries no dispatch bookkeeping); the hybrid driver exposes
every cycle.  Tested by tests/test_io_cli.py::
test_fused_multicycle_dispatch_boundary_resume.
"""
from __future__ import annotations

import json
from typing import Optional, Tuple

import jax
import numpy as np

from ..config import IRAMConfig
from ..core.arnoldi import FactorizationState
from ..utils.stats import OpCounts

_FORMAT_VERSION = 1


def save_state(path, state: FactorizationState, cfg: IRAMConfig,
               save_resid_only: bool = False) -> None:
    """Serialize solver state (+ config echo for validation) to ``.npz``."""
    host = jax.device_get(state)
    arrays = {
        "resid": np.asarray(host.resid),
        "rnorm": np.asarray(host.rnorm),
        "key": np.asarray(jax.random.key_data(state.key)),
    }
    if not save_resid_only:
        arrays.update({
            "V": np.asarray(host.V),
            "H": np.asarray(host.H),
            "b_resid": np.asarray(host.b_resid),
            "k": np.asarray(host.k),
            "nev_cur": np.asarray(host.nev_cur),
            "iter": np.asarray(host.iter),
            "info": np.asarray(host.info),
            "counts": np.stack([np.asarray(c) for c in host.counts]),
        })
    meta = dict(version=_FORMAT_VERSION, n=cfg.n, nev=cfg.nev, ncv=cfg.ncv,
                which=cfg.which, bmat=cfg.bmat, mode=cfg.mode,
                symmetric=cfg.symmetric, dtype=np.dtype(cfg.dtype).name,
                n_pad=cfg.n_pad, resid_only=save_resid_only)
    np.savez(path, __meta__=json.dumps(meta), **arrays)


def load_state(path, cfg: Optional[IRAMConfig] = None
               ) -> Tuple[Optional[FactorizationState], dict]:
    """Load a checkpoint.  Returns (state | None, meta).

    ``state`` is None for resid-only checkpoints — pass ``resid`` (in
    ``meta['resid']``) as ``v0`` to a fresh solve, exactly the reference's
    info!=0 protocol."""
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["__meta__"]))
        if cfg is not None:
            for f in ("n", "nev", "ncv", "which", "bmat", "mode",
                      "symmetric", "n_pad"):
                if getattr(cfg, f) != meta[f]:
                    raise ValueError(
                        f"checkpoint/config mismatch on {f}: "
                        f"{meta[f]} vs {getattr(cfg, f)}")
        if meta["resid_only"]:
            meta["resid"] = z["resid"]
            return None, meta
        # counters are stored positionally; older checkpoints may carry
        # fewer of them — missing trailing counters resume from zero
        cvals = [jax.numpy.asarray(c) for c in z["counts"]]
        nfields = len(OpCounts._fields)
        cvals = (cvals + [jax.numpy.zeros((), jax.numpy.int32)]
                 * (nfields - len(cvals)))[:nfields]
        counts = OpCounts(*cvals)
        state = FactorizationState(
            V=jax.numpy.asarray(z["V"]),
            H=jax.numpy.asarray(z["H"]),
            resid=jax.numpy.asarray(z["resid"]),
            b_resid=jax.numpy.asarray(z["b_resid"]),
            rnorm=jax.numpy.asarray(z["rnorm"]),
            k=jax.numpy.asarray(z["k"]),
            nev_cur=jax.numpy.asarray(z["nev_cur"]),
            iter=jax.numpy.asarray(z["iter"]),
            info=jax.numpy.asarray(z["info"]),
            key=jax.random.wrap_key_data(jax.numpy.asarray(z["key"])),
            counts=counts,
        )
        return state, meta
