#!/bin/bash
# Build the reference bundler (snavely/bundler_sfm @ /root/reference) on this
# machine so benchmarks can race against the real thing.
#
# Recipe (no gfortran in this image):
#   - copy the read-only reference tree to a scratch build dir
#   - lib/cminpack (C MINPACK, f2c 32-bit integers) stands in for the
#     Fortran lib/minpack: it exports the same lmdif_/lmdif1_ symbols that
#     lib/matrix/matrix.c:457,548 call
#   - system liblapack.so.3/libblas.so.3 provide the LAPACK/BLAS Fortran
#     symbols instead of the vendored clapack
#   - ANN_char built as the shared lib the src/Makefile expects
#
# Usage: benchmarks/build_reference.sh [BUILD_DIR]   (default /tmp/refbuild)
# Produces: $BUILD_DIR/bin/{bundler,KeyMatchFull,Bundle2Ply,...}
set -e
REF=${REF:-/root/reference}
B=${1:-/tmp/refbuild}

if [ -x "$B/bin/bundler" ] && [ -x "$B/bin/KeyMatchFull" ]; then
    echo "already built: $B/bin"
    exit 0
fi

rm -rf "$B"
mkdir -p "$B"
cp -r "$REF/src" "$REF/lib" "$REF/include" "$B/"
mkdir -p "$B/bin"
cd "$B"

NPROC=$(nproc)

# --- libs that build as-is -------------------------------------------------
make -C lib/5point -j"$NPROC" >/dev/null
make -C lib/ann_1.1_char linux-g++-shared -j"$NPROC" >/dev/null
make -C lib/imagelib -j"$NPROC" >/dev/null 2>&1
make -C lib/matrix -j"$NPROC" >/dev/null
make -C lib/sba-1.5 -j"$NPROC" >/dev/null
make -C lib/sfm-driver -j"$NPROC" >/dev/null
make -C lib/cblas -j"$NPROC" >/dev/null 2>&1 || true
cp lib/cblas/libcblas.a lib/ 2>/dev/null || true

# System lapack/blas ship only as versioned .so.3 — give the linker plain
# names inside the build tree (already on the -L path).
ln -sf /lib/x86_64-linux-gnu/liblapack.so.3 lib/liblapack.so
ln -sf /lib/x86_64-linux-gnu/libblas.so.3 lib/libblas.so

# --- cminpack as libminpack.a (stands in for Fortran minpack) ---------------
# f2c "integer" must be 32-bit int to match how lib/matrix passes int*
# (vendored lib/f2c/f2c.h says long int — wrong on LP64).
cd lib/cminpack
mkdir -p f2c32
sed -e 's/typedef long int integer;/typedef int integer;/' \
    -e 's/typedef unsigned long int uinteger;/typedef unsigned int uinteger;/' \
    ../f2c/f2c.h > f2c32/f2c.h
for f in *.c; do
    gcc -O3 -If2c32 -c "$f" -o "${f%.c}.o"
done
ar rcs ../libminpack.a ./*.o
cd ../..

# --- bundler + tools ---------------------------------------------------------
# Patch the src Makefile: drop -lgfortran (no gfortran runtime needed by
# cminpack) and -lcblas (system libblas provides cblas_* too... the reference
# only needs Fortran BLAS symbols, which libblas has).
sed -e 's/-lgfortran//' src/Makefile > src/Makefile.local
make -C src -f Makefile.local -j"$NPROC" >/dev/null 2>src/build.err || {
    echo "build failed; tail of src/build.err:"; tail -40 src/build.err; exit 1;
}

cp lib/ann_1.1_char/lib/libANN_char.so bin/ 2>/dev/null || true
ls -l bin/
echo "OK: reference built at $B/bin"
