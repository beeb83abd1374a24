#!/bin/sh
# Build the native runtime shared object.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    reconstructor_native.cpp \
    -o libreconstructor_native.so \
    -ljpeg -lpthread
echo "built native/libreconstructor_native.so"
