"""Test configuration.

Tests run on CPU with 8 virtual devices (the reference tests multi-node as
multi-process on one node under ``mpiexec -n 2``, CMakeLists.txt:75; the TPU
analog is a virtual host-platform device mesh).  float64 is enabled so the
reference's double-precision (d/z) paths can be tested bit-seriously; TPU
runs use float32/bfloat16 (f64 is emulated on TPU).
"""
import os

# NOTE: this image pre-imports jax from sitecustomize with
# JAX_PLATFORMS=axon, so plain env vars are too late — use jax.config.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest
import scipy.sparse as sp


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def residual(a_sp, vals, vecs, m_sp=None):
    """Independent-oracle residual ||A v - lambda (M) v|| / |lambda| — the
    reference's universal check (arpackSolver.hpp:297-323)."""
    res = []
    for i in range(len(vals)):
        v = vecs[:, i]
        av = a_sp @ v
        mv = (m_sp @ v) if m_sp is not None else v
        res.append(np.linalg.norm(av - vals[i] * mv)
                   / max(1.0, abs(vals[i])))
    return np.array(res)
