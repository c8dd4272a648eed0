#!/bin/bash
# Build the reference WaveRange binaries + the dump harness out-of-tree.
# Sources stay in /root/reference (read-only); objects/binaries land in
# /root/repo/build/oracle. Flags mirror reference config.mk (g++ for mpicxx).
set -e
REF=/root/reference
OUT=/root/repo/build/oracle
mkdir -p "$OUT"
cd "$OUT"

CFLAGS="-Wall -O2 -ftree-vectorize -fomit-frame-pointer -funroll-loops -march=native -ffp-contract=off"
CXXFLAGS="-Wall -O2 -ftree-vectorize -D__STDC_LIMIT_MACROS -march=native -ffp-contract=off"

if [ ! -f rangecod.o ] || [ "$REF/src/rangecod/rangecod.c" -nt rangecod.o ]; then
  gcc $CFLAGS -c "$REF/src/rangecod/rangecod.c" -o rangecod.o
  gcc $CFLAGS -c "$REF/src/waveletcdf97_3d/waveletcdf97_3d.c" -o waveletcdf97_3d.o
  g++ $CXXFLAGS -c "$REF/src/core/wrappers.cpp" -o wrappers.o
fi

# generic CLI encoders/decoders
if [ ! -f wrenc ]; then
  g++ $CXXFLAGS -c "$REF/src/generic/gen_aux.cpp" -o gen_aux.o
  g++ $CXXFLAGS -c "$REF/src/generic/gen_enc.cpp" -o gen_enc.o
  g++ $CXXFLAGS -c "$REF/src/generic/gen_dec.cpp" -o gen_dec.o
  g++ $CXXFLAGS gen_enc.o gen_aux.o wrappers.o waveletcdf97_3d.o rangecod.o -o wrenc
  g++ $CXXFLAGS gen_dec.o gen_aux.o wrappers.o waveletcdf97_3d.o rangecod.o -o wrdec
fi

# mssg CLI
if [ ! -f wrmssgenc ]; then
  g++ $CXXFLAGS -c "$REF/src/mssg/ctrl_aux.cpp" -o ctrl_aux.o
  g++ $CXXFLAGS -c "$REF/src/mssg/mssg_enc.cpp" -o mssg_enc.o
  g++ $CXXFLAGS -c "$REF/src/mssg/mssg_dec.cpp" -o mssg_dec.o
  g++ $CXXFLAGS mssg_enc.o ctrl_aux.o wrappers.o waveletcdf97_3d.o rangecod.o -o wrmssgenc
  g++ $CXXFLAGS mssg_dec.o ctrl_aux.o wrappers.o waveletcdf97_3d.o rangecod.o -o wrmssgdec
fi

# dump harness (our own test tool linking reference objects)
if [ ! -f dump_harness ] || [ /root/repo/tools/oracle/dump_harness.cc -nt dump_harness ]; then
  g++ $CXXFLAGS /root/repo/tools/oracle/dump_harness.cc \
    wrappers.o waveletcdf97_3d.o rangecod.o -o dump_harness
fi

echo "oracle built in $OUT"
