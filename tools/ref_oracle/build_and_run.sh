#!/bin/bash
# Build the reference-code adjacency oracle and dump its numbers.
# Eigen comes from the headers TensorFlow vendors (no network, no installs).
set -e
cd "$(dirname "$0")"
REF=/root/reference/src
EIGEN=$(python - <<'EOF'
import pathlib, tensorflow as tf
print(pathlib.Path(tf.__file__).parent / "include")
EOF
)
# _img_manipulation.cpp is not linked: neither _homography.cpp nor
# _util.cpp calls into it (its header is included for types only), and it
# needs Eigen 3.4 while TF vendors 3.3.x
g++ -O2 -std=c++20 -w \
    adjacency_oracle.cpp "$REF/math/_homography.cpp" "$REF/system/_util.cpp" \
    -I"$REF/math" -I"$REF/system" -I"$EIGEN" \
    $(pkg-config --cflags --libs opencv4) \
    -o /tmp/ref_adjacency_oracle
/tmp/ref_adjacency_oracle "$@"
