#!/bin/sh
# Build the native components:
#   libarpack_tpu_native.so  — reduced-space kernels (no dependencies)
#   libarpack_tpu_capi.so    — full-solver C ABI (embeds CPython)
#   test_capi                — C smoke test (icb_arpack_c.c analog)
set -e
cd "$(dirname "$0")"
mkdir -p build
g++ -O3 -shared -fPIC -std=c++17 -Iinclude src/reduced.cc \
    -o build/libarpack_tpu_native.so
PYINC=$(python3-config --includes)
PYLD=$(python3-config --ldflags --embed)
g++ -O2 -shared -fPIC -std=c++17 -Iinclude $PYINC src/capi.cc \
    -o build/libarpack_tpu_capi.so $PYLD
gcc -O2 -Iinclude tests/test_capi.c -o build/test_capi -lm \
    -Lbuild -larpack_tpu_capi -Wl,-rpath,"$(pwd)/build"
g++ -O2 -std=c++17 -Iinclude tests/test_capi_cpp.cc -o build/test_capi_cpp \
    -Lbuild -larpack_tpu_capi -Wl,-rpath,"$(pwd)/build"
echo "native build OK"
