#!/bin/sh
# Build the native transcript core (Keccak-f1600 + STROBE-128).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libbptranscript.so transcript.cpp verify_prep.cpp prove_prep.cpp ristretto.cpp sc_vec.cpp
echo "built $(pwd)/libbptranscript.so"
