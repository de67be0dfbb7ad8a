"""Full-solver C ABI test: builds and runs the C smoke test
(native/tests/test_capi.c — the icb_arpack_c.c analog)."""
import os
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow  # compiles the native library: run with -m slow

NATIVE = Path(__file__).resolve().parent.parent / "native"


def _cpu_env(n_devices=4):
    """JAX-on-CPU env with virtual devices: the mpiexec -n analog for the
    distributed C entry points (parpack.h parity tier)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count="
                        + str(n_devices)).strip()
    return env


@pytest.mark.skipif(os.environ.get("ARPACK_TPU_NO_NATIVE", "") != "",
                    reason="native disabled")
def test_c_abi_smoke():
    r = subprocess.run(["sh", str(NATIVE / "build.sh")],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    r = subprocess.run([str(NATIVE / "build" / "test_capi")],
                       capture_output=True, text=True, timeout=280,
                       env=_cpu_env())
    assert r.returncode == 0, (r.stdout + r.stderr)[-2000:]
    assert "C-ABI OK" in r.stdout
    # the parallel (parpack.h-analog) tier actually ran on >1 device
    assert "SKIP parallel" not in r.stdout


@pytest.mark.skipif(os.environ.get("ARPACK_TPU_NO_NATIVE", "") != "",
                    reason="native disabled")
def test_c_abi_int32_build():
    """INTERFACE64 parity knob (arpackdef.h.in:6-44): the same C ABI
    builds and passes with a 32-bit atpu_int (-DATPU_INTERFACE64=0),
    the libarpack-vs-libarpackILP64 switch with the widths swapped
    (our default is 64)."""
    r = subprocess.run(["sh", str(NATIVE / "build32.sh")],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    r = subprocess.run([str(NATIVE / "build32" / "test_capi")],
                       capture_output=True, text=True, timeout=280,
                       env=_cpu_env())
    assert r.returncode == 0, (r.stdout + r.stderr)[-2000:]
    assert "C-ABI OK" in r.stdout


@pytest.mark.skipif(os.environ.get("ARPACK_TPU_NO_NATIVE", "") != "",
                    reason="native disabled")
def test_cpp_typed_enum_header():
    """arpack.hpp analog: overloads + scoped enums (icb_arpack_cpp.cpp)."""
    exe = NATIVE / "build" / "test_capi_cpp"
    if not exe.exists():
        r = subprocess.run(["sh", str(NATIVE / "build.sh")],
                           capture_output=True, text=True, timeout=300)
        assert r.returncode == 0, r.stderr[-2000:]
    r = subprocess.run([str(exe)], capture_output=True, text=True,
                       timeout=280, env=_cpu_env())
    assert r.returncode == 0, (r.stdout + r.stderr)[-2000:]
    assert "typed-enum header OK" in r.stdout
    assert "SKIP parallel" not in r.stdout
