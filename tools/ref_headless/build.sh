#!/bin/bash
# Build the full reference pipeline headlessly (no GTK) so its CPU
# wall-clock can be measured per sequence.  The gtk_stub include dir
# replaces src/ui/_gtk_vars.h; Eigen comes from the TF-vendored headers
# with the same 3.4 `Eigen::all` shim build_ba_oracle.sh uses.
set -e
cd "$(dirname "$0")"
REF=/root/reference/src
BIN=${BIN:-/tmp/ref_headless}
EIGEN=$(python - <<'EOF'
import pathlib, tensorflow as tf
print(pathlib.Path(tf.__file__).parent / "include")
EOF
)
printf '#include <Eigen/Core>\nnamespace Eigen { using placeholders::all; }\n' \
    > /tmp/eigen_shim.h

SRCS=(
  headless_main.cpp
  "$REF/classes/_panorama.cpp" "$REF/classes/_image.cpp"
  "$REF/math/_homography.cpp" "$REF/math/_stitch.cpp"
  "$REF/math/_img_manipulation.cpp"
  "$REF/math/_bundle_adjust_tools.cpp" "$REF/math/_bundle_adjust_main.cpp"
  "$REF/math/_bundle_adjust_fast.cpp"
  "$REF/math/_projection.cpp" "$REF/math/_straightening.cpp"
  "$REF/math/_gain_compensation.cpp"
  "$REF/math/_graph_cut.cpp" "$REF/math/_graph_cut_helper.cpp"
  "$REF/math/_distance_cut.cpp" "$REF/math/_blending.cpp"
  "$REF/system/_util.cpp"
  "$REF/test/_test.cpp"
  "$REF/max_flow/graph.cpp" "$REF/max_flow/maxflow.cpp"
)

newest=0
for f in "${SRCS[@]}" gtk_stub/_gtk_vars.h; do
  t=$(stat -c %Y "$f"); [ "$t" -gt "$newest" ] && newest=$t
done
if [ -x "$BIN" ] && [ "$(stat -c %Y "$BIN")" -ge "$newest" ]; then
  exit 0
fi

g++ -O2 -std=c++20 -w -fopenmp -include /tmp/eigen_shim.h \
    "${SRCS[@]}" \
    -Igtk_stub -I"$REF/math" -I"$REF/system" -I"$REF/classes" \
    -I"$REF/test" -I"$REF/max_flow" -I"$EIGEN" \
    $(pkg-config --cflags --libs opencv4) \
    -o "$BIN"
echo "built $BIN"
