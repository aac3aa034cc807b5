#!/bin/sh
# Build the native witness generator shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libwitness.so witness.cpp
echo "built $(pwd)/libwitness.so"
