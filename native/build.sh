#!/bin/sh
# Build the native transcript core (Keccak-f1600 + STROBE-128).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -c -fPIC transcript.cpp verify_prep.cpp prove_prep.cpp ristretto.cpp sc_vec.cpp
g++ -O3 -march=native -mavx512ifma -mavx512vl -mavx512f -c -fPIC ristretto_ifma.cpp
g++ -shared -o libbptranscript.so transcript.o verify_prep.o prove_prep.o ristretto.o sc_vec.o ristretto_ifma.o
rm -f *.o
echo "built $(pwd)/libbptranscript.so"
