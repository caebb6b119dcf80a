#!/bin/sh
# default config (RayTracedGGX.cpp:37-39: dragon + rnl_cross)
exec python3 -m raytracedggx_tpu.engine.cli \
    -mesh /root/reference/Bin/Assets/dragon.obj \
    -env /root/reference/Bin/Assets/rnl_cross.dds "$@"
