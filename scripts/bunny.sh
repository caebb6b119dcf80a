#!/bin/sh
# Bin/Bunny.bat analog
exec python3 -m raytracedggx_tpu.engine.cli \
    -mesh /root/reference/Bin/Assets/bunny.obj 0.0 0.0 0.0 1.0 \
    -env /root/reference/Bin/Assets/rnl_cross.dds "$@"
