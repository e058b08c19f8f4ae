#!/bin/bash
# Build the native libraries (C ABI, loaded via ctypes).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC kitti_ap.cpp -o libkitti_ap.so
g++ -O3 -march=native -shared -fPIC -pthread kitti_loader.cpp \
    -o libkitti_loader.so
echo "built: $(ls *.so)"
