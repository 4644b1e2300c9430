#!/usr/bin/env bash
# Builds the distributable wheel (counterpart of the reference's
# pip_build.py). Pure-Python wheel; the native COO preprocessing engine
# (native/coo_preprocess.cc) is compiled on first use when a C++
# toolchain is present and falls back to the bit-identical numpy
# backend otherwise, so the wheel itself stays py3-none-any.
#
#   ./tools/build_wheel.sh [outdir]    # default dist/
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-dist}"
pip wheel . --no-deps --no-build-isolation -w "$OUT"
ls -l "$OUT"
