#!/bin/sh
# Build the host-side native tools (offline asset cooking).
set -e
cd "$(dirname "$0")"
cmake -S . -B build -G Ninja >/dev/null
cmake --build build
echo "built: $(ls build/vhacd_tool)"
