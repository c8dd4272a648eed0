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

# flusi CLI — no HDF5 dev headers in the image, so build against a
# minimal API shim (tools/oracle/hdf5_shim/hdf5.h) and link h5py's
# bundled libhdf5 runtime directly. ABI is pinned by the interop tests.
HDF5_LIB=$(ls /opt/venv/lib/python3.12/site-packages/h5py.libs/libhdf5-*.so.* 2>/dev/null | grep -v _hl | head -1)
SHIM=/root/repo/tools/oracle/hdf5_shim
if [ -n "$HDF5_LIB" ] && { [ ! -f wrencflusi ] || [ "$SHIM/hdf5.h" -nt wrencflusi ]; }; then
  # hdf5_interfaces.cpp:389,581 compare a POINTER against 0 ("ntot_enc
  # > 0" where ntot_enc is unsigned long*) — always true on any real
  # build, but a hard error for g++ 12. Compile a copy with the
  # semantically identical "!= NULL" spelling.
  sed -e 's/if (ntot_enc > 0)/if (ntot_enc != NULL)/' \
    "$REF/src/flusi/hdf5_interfaces.cpp" > hdf5_interfaces_patched.cpp
  g++ $CXXFLAGS -I"$SHIM" -I"$REF/src/flusi" -c hdf5_interfaces_patched.cpp -o hdf5_interfaces.o
  g++ $CXXFLAGS -I"$SHIM" "$REF/src/flusi/main_enc.cpp" hdf5_interfaces.o \
    wrappers.o waveletcdf97_3d.o rangecod.o "$HDF5_LIB" \
    -Wl,--disable-new-dtags -Wl,-rpath,"$(dirname "$HDF5_LIB")" -o wrencflusi
  g++ $CXXFLAGS -I"$SHIM" "$REF/src/flusi/main_dec.cpp" hdf5_interfaces.o \
    wrappers.o waveletcdf97_3d.o rangecod.o "$HDF5_LIB" \
    -Wl,--disable-new-dtags -Wl,-rpath,"$(dirname "$HDF5_LIB")" -o wrdecflusi
fi

# dump harness (our own test tool linking reference objects)
if [ ! -f dump_harness ] || [ /root/repo/tools/oracle/dump_harness.cc -nt dump_harness ]; then
  g++ $CXXFLAGS /root/repo/tools/oracle/dump_harness.cc \
    wrappers.o waveletcdf97_3d.o rangecod.o -o dump_harness
fi

# STOCK build: the reference's own config.mk flags (no -ffp-contract
# flag -> gcc default "fast", so the compiler may contract FMAs in the
# codec's accumulate/lifting loops). Used only to MEASURE how a stock
# reference build deviates from the ISO-semantics oracle
# (tests/test_stock_conformance.py); the ISO build stays normative.
STOCK_CFLAGS="-Wall -O2 -ftree-vectorize -fomit-frame-pointer -funroll-loops -march=native"
STOCK_CXXFLAGS="-Wall -O2 -ftree-vectorize -D__STDC_LIMIT_MACROS -march=native"
if [ ! -f dump_harness_stock ] || [ /root/repo/tools/oracle/dump_harness.cc -nt dump_harness_stock ]; then
  gcc $STOCK_CFLAGS -c "$REF/src/rangecod/rangecod.c" -o rangecod_stock.o
  gcc $STOCK_CFLAGS -c "$REF/src/waveletcdf97_3d/waveletcdf97_3d.c" -o waveletcdf97_3d_stock.o
  g++ $STOCK_CXXFLAGS -c "$REF/src/core/wrappers.cpp" -o wrappers_stock.o
  g++ $STOCK_CXXFLAGS /root/repo/tools/oracle/dump_harness.cc \
    wrappers_stock.o waveletcdf97_3d_stock.o rangecod_stock.o -o dump_harness_stock
fi

echo "oracle built in $OUT"
