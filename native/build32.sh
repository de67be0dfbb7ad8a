#!/bin/sh
# ILP32-interface build: 32-bit atpu_int ABI — the INTERFACE64 parity
# knob of the reference (arpackdef.h.in:6-44), widths swapped (our
# default is the 64-bit superset).  Separate build dir so the default
# 64-bit libraries (which the Python ctypes wrappers load) are untouched.
set -e
cd "$(dirname "$0")"
mkdir -p build32
g++ -O3 -shared -fPIC -std=c++17 -DATPU_INTERFACE64=0 -Iinclude \
    src/reduced.cc -o build32/libarpack_tpu_native.so
PYINC=$(python3-config --includes)
PYLD=$(python3-config --ldflags --embed)
g++ -O2 -shared -fPIC -std=c++17 -DATPU_INTERFACE64=0 -Iinclude $PYINC \
    src/capi.cc -o build32/libarpack_tpu_capi.so $PYLD
gcc -O2 -DATPU_INTERFACE64=0 -Iinclude tests/test_capi.c \
    -o build32/test_capi -lm \
    -Lbuild32 -larpack_tpu_capi -Wl,-rpath,"$(pwd)/build32"
echo "native ILP32 build OK"
