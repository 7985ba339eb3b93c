#!/bin/sh
# Build the native policy runtime shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -std=c++17 -fPIC -shared -o libgrxpolicy.so policy_runtime.cc
echo "built $(pwd)/libgrxpolicy.so"
