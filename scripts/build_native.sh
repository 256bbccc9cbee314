#!/bin/sh
# Build the native host-IO library (native/libstereo_io.so).
set -e
cd "$(dirname "$0")/.."
g++ -O3 -march=native -shared -fPIC -o native/libstereo_io.so native/stereo_io.cpp -lpng16
echo "built native/libstereo_io.so"
