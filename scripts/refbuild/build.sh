#!/bin/bash
# Build the serially-patched C++ reference for golden-file generation.
# Usage: scripts/refbuild/build.sh [/tmp/refbuild]
set -e
DEST="${1:-/tmp/refbuild}"
HERE="$(cd "$(dirname "$0")" && pwd)"

rm -rf "$DEST"
cp -r /root/reference "$DEST"
python "$HERE/patch_serial.py" "$DEST"

# -llapack -lblas need unversioned sonames
mkdir -p "$DEST/locallib"
ln -sf /usr/lib/x86_64-linux-gnu/liblapack.so.3 "$DEST/locallib/liblapack.so"
ln -sf /usr/lib/x86_64-linux-gnu/libblas.so.3 "$DEST/locallib/libblas.so"

cd "$DEST"
export LIBRARY_PATH="$DEST/locallib:$LIBRARY_PATH"
make -C src/base -j8
make -C src/atm -j8
make -C test/shallowwater_sphere -j8
make -C test/nonhydro_xz -j8
make -C test/nonhydro_sphere -j8
echo "refbuild complete: $DEST"
