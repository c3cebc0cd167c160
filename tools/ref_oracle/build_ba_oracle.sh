#!/bin/bash
# Build the reference-code BA oracle and dump its numbers.
# Usage: build_ba_oracle.sh [seq=map] [fast=0] [init_size=700]
# Eigen comes from the headers TensorFlow vendors; the vendored snapshot
# predates the Eigen 3.4 `Eigen::all` alias, so a two-line shim header
# (using placeholders::all) is force-included.
set -e
cd "$(dirname "$0")"
REF=/root/reference/src
EIGEN=$(python - <<'EOF'
import pathlib, tensorflow as tf
print(pathlib.Path(tf.__file__).parent / "include")
EOF
)
printf '#include <Eigen/Core>\nnamespace Eigen { using placeholders::all; }\n' \
    > /tmp/eigen_shim.h
if [ ! -x /tmp/ref_ba_oracle ] || [ ba_oracle.cpp -nt /tmp/ref_ba_oracle ]; then
g++ -O2 -std=c++20 -w -fopenmp -include /tmp/eigen_shim.h \
    ba_oracle.cpp \
    "$REF/math/_homography.cpp" "$REF/system/_util.cpp" \
    "$REF/math/_stitch.cpp" "$REF/math/_img_manipulation.cpp" \
    "$REF/math/_bundle_adjust_tools.cpp" \
    "$REF/math/_bundle_adjust_main.cpp" \
    "$REF/math/_bundle_adjust_fast.cpp" \
    -I"$REF/math" -I"$REF/system" -I"$EIGEN" \
    $(pkg-config --cflags --libs opencv4) \
    -o /tmp/ref_ba_oracle
fi
/tmp/ref_ba_oracle "$@"
