"""Reference-image fidelity gate (VERDICT r2 item 5).

scripts/validate_reference.py recovers the published screenshot's
unknowns (animation angle, mouse-orbit camera, ground-plate scale —
RayTracedGGX.cpp:401-455, RayTracer.cpp:192/270-272) on the TPU and
records the winning configuration plus its 320x180 SSIM against
/root/reference/Doc/Images/rnl_dragon.png in
docs/validation/rnl_dragon_metrics.json.

This test re-renders that exact configuration on CPU and asserts the
SSIM has not regressed below the recorded baseline (small margin for
CPU-vs-TPU traversal/kernel numeric differences).  Any kernel or
shading rewrite that drifts the image now fails CI instead of silently
rotting the fidelity number.
"""

import json
import os

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
METRICS = os.path.join(ROOT, "docs", "validation",
                       "rnl_dragon_metrics.json")
REF_PNG = "/root/reference/Doc/Images/rnl_dragon.png"

pytestmark = pytest.mark.slow


@pytest.mark.skipif(not (os.path.exists(METRICS)
                         and os.path.exists(REF_PNG)),
                    reason="validation metrics or reference image absent")
def test_reference_image_ssim_gate():
    with open(METRICS) as f:
        m = json.load(f)
    if "ssim_gate_320" not in m:
        pytest.skip("metrics predate the gate field; re-run "
                    "scripts/validate_reference.py")

    import sys
    sys.path.insert(0, os.path.join(ROOT, "scripts"))
    import validate_reference as vr

    from raytracedggx_tpu.utils.ssim import ssim, downsample

    ref_small = downsample(vr.load_ref(), 4)
    cam = vr.cam_arrays(320, 180, m["yaw"], m["pitch"], m["dist"])
    img = vr.render(m["angle"], 320, 180, frames=12, cam=cam,
                    gs=m["ground_scale"])
    s = ssim(np.asarray(img), ref_small)
    # margin tightened 0.02 -> 0.01 in round 5: the CPU render at HEAD
    # scores 0.4441 at gate scale (docs/validation/README.md), i.e. the
    # recorded 0.4433 gate is already within 0.001 of reality — the
    # margin only needs to cover CPU-vs-TPU numerics, not model error
    assert s >= m["ssim_gate_320"] - 0.01, (
        f"reference-image SSIM regressed: {s:.4f} < recorded "
        f"{m['ssim_gate_320']:.4f} - margin")
