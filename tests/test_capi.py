"""Full-solver C ABI test: builds and runs the C smoke test
(native/tests/test_capi.c — the icb_arpack_c.c analog)."""
import os
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow  # compiles the native library: run with -m slow

NATIVE = Path(__file__).resolve().parent.parent / "native"


@pytest.mark.skipif(os.environ.get("ARPACK_TPU_NO_NATIVE", "") != "",
                    reason="native disabled")
def test_c_abi_smoke():
    r = subprocess.run(["sh", str(NATIVE / "build.sh")],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([str(NATIVE / "build" / "test_capi")],
                       capture_output=True, text=True, timeout=280,
                       env=env)
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
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([str(exe)], capture_output=True, text=True,
                       timeout=280, env=env)
    assert r.returncode == 0, (r.stdout + r.stderr)[-2000:]
    assert "typed-enum header OK" in r.stdout
