#!/bin/sh
# Environment-probe sweep (galileo/grace/stpeters/uffizi/rnl .bat analogs;
# BASELINE config 4). Only rnl_cross.dds ships with the reference assets —
# others are rendered if present next to it.
ASSETS=${ASSETS:-/root/reference/Bin/Assets}
for probe in galileo grace stpeters uffizi rnl; do
    f="$ASSETS/${probe}_cross.dds"
    [ -f "$f" ] || { echo "skip $probe (no $f)"; continue; }
    python3 -m raytracedggx_tpu.engine.cli \
        -mesh "$ASSETS/dragon.obj" -env "$f" \
        --frames 32 --out "sweep_${probe}.png" "$@"
done
