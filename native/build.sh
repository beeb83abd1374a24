#!/bin/sh
# Build the native runtime shared object.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 -fopenmp \
    reconstructor_native.cpp ba_schur.cpp \
    -o libreconstructor_native.so \
    -ljpeg -lpthread
echo "built native/libreconstructor_native.so"
