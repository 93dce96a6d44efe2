#!/bin/sh
# Build the native mesh toolchain shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -o libmeshtools.so meshtools.cpp
echo "built $(pwd)/libmeshtools.so"
