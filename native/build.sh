#!/bin/bash
# Build the native runtime layer (no external deps; plain C++17).
set -euo pipefail
cd "$(dirname "$0")"
mkdir -p lib
g++ -O3 -fPIC -shared -std=c++17 src/packing.cpp -o lib/libhpmpc_tpu_native.so
echo "built lib/libhpmpc_tpu_native.so"
