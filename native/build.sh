#!/bin/sh
# Build the native IO runtime -> native/libmvs_io.so
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -pthread -o libmvs_io.so mvs_io.cpp
echo "built $(pwd)/libmvs_io.so"
