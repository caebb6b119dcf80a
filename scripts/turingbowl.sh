#!/bin/sh
# Bin/TuringBowl.bat analog
exec python3 -m raytracedggx_tpu.engine.cli \
    -mesh /root/reference/Bin/Assets/TuringBowl.obj 0.0 2.8 0.0 0.03 \
    -env /root/reference/Bin/Assets/rnl_cross.dds "$@"
