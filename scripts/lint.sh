#!/bin/bash
# Static checks (reference's CMake `lint` target equivalent,
# CMakeLists.txt:75-82). The image has no ruff/clang-format; this uses
# what's available: bytecode compilation of every Python file, g++
# syntax+warning pass over the native code, and pytest collection.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== python compileall =="
python -m compileall -q umx_tpu tests scripts bench.py __graft_entry__.py

echo "== native g++ -Wall -Wextra -Werror -fanalyzer static analysis =="
# -fanalyzer is GCC's interprocedural path-sensitive analyzer — the
# available analog of the reference's cppcheck --enable=all + clang
# scan-build lint target (CMakeLists.txt:75-82); it checks for leaks,
# use-after-free, null derefs, and out-of-bounds paths.
for src in native/umxio.cpp native/flac.cpp; do
  g++ -O2 -Wall -Wextra -Werror -std=c++17 -fanalyzer -fsyntax-only "$src"
done

echo "== pytest collection =="
python -m pytest tests/ --collect-only -q | tail -2

echo "lint OK"
