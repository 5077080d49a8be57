#!/bin/sh
# Build the native host backend (Keccak/STROBE transcript core + ristretto
# curve library).  The final .so lands via mv so a rebuild never truncates
# a library some running process has mapped.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -c -fPIC transcript.cpp verify_prep.cpp prove_prep.cpp ristretto.cpp sc_vec.cpp linear_prep.cpp
g++ -O3 -march=native -mavx512ifma -mavx512vl -mavx512f -c -fPIC ristretto_ifma.cpp verify_emit_ifma.cpp
g++ -shared -o libbptranscript.so.tmp transcript.o verify_prep.o prove_prep.o ristretto.o sc_vec.o linear_prep.o ristretto_ifma.o verify_emit_ifma.o
mv libbptranscript.so.tmp libbptranscript.so
rm -f *.o
echo "built $(pwd)/libbptranscript.so"
