#!/bin/bash
# Build libdataio.so (threaded PNG/JPEG/EXR batch decoder).
set -e
cd "$(dirname "$0")"
EXR_INC=$(ls -d /usr/include/OpenEXR 2>/dev/null || true)
IMATH_INC=$(ls -d /usr/include/Imath 2>/dev/null || true)
g++ -O3 -fPIC -shared -std=c++17 -pthread \
    ${EXR_INC:+-I$EXR_INC} ${IMATH_INC:+-I$IMATH_INC} \
    dataio.cpp -o libdataio.so \
    -lpng -ljpeg -lOpenEXR-3_1 -lImath-3_1 -lIlmThread-3_1 -lIex-3_1 -lz
echo "built $(pwd)/libdataio.so"
