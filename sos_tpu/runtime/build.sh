#!/bin/sh
# Build the native audio runtime (sos_tpu/runtime/libsosaudio.so).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libsosaudio.so audio_engine.cpp -lpthread -lm
echo "built $(pwd)/libsosaudio.so"
