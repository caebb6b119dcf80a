"""Attribute the reference-image SSIM residual by region and channel
(VERDICT r2 item 5: 'the residual 0.32 is unexplained').

Reads the saved validation render (docs/validation/rnl_dragon_tpu.png)
and the published reference, and reports SSIM / mean-abs over:
- full frame
- model region (center crop around the dragon)
- ground-plate band
- background (everything else)
plus per-channel means and a high-frequency (Laplacian) energy ratio per
region — the published screenshot's background is visibly blurrier than
a converged static-camera render, consistent with TAA motion history
from the mouse orbit that framed the shot (RayTracedGGX.cpp:412-439),
which no static re-render can reproduce.

CPU-only: python scripts/diagnose_reference.py
"""

import json
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OURS = os.path.join(ROOT, "docs", "validation", "rnl_dragon_tpu.png")
REF = "/root/reference/Doc/Images/rnl_dragon.png"


def load(p):
    from PIL import Image

    return np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0


def lap_energy(img):
    g = img.mean(-1)
    l4 = (4 * g[1:-1, 1:-1] - g[:-2, 1:-1] - g[2:, 1:-1]
          - g[1:-1, :-2] - g[1:-1, 2:])
    return float(np.mean(l4 * l4))


def main():
    from raytracedggx_tpu.utils.ssim import ssim

    ours, ref = load(OURS), load(REF)
    h, w = ref.shape[:2]
    regions = {
        "full": (slice(0, h), slice(0, w)),
        "model": (slice(int(0.15 * h), int(0.65 * h)),
                  slice(int(0.28 * w), int(0.72 * w))),
        "plate": (slice(int(0.60 * h), int(0.95 * h)),
                  slice(int(0.15 * w), int(0.88 * w))),
        "background_top": (slice(0, int(0.30 * h)), slice(0, w)),
    }
    out = {}
    for name, (ry, rx) in regions.items():
        a, b = ours[ry, rx], ref[ry, rx]
        out[name] = dict(
            ssim=round(float(ssim(a, b)), 4),
            mean_abs=round(float(np.abs(a - b).mean()), 4),
            chan_delta=[round(float(a[..., c].mean()
                                    - b[..., c].mean()), 4)
                        for c in range(3)],
            hf_ours=round(lap_energy(a), 6),
            hf_ref=round(lap_energy(b), 6),
        )
        r = out[name]
        print(f"{name:15s} ssim {r['ssim']:.4f}  mean|d| "
              f"{r['mean_abs']:.4f}  dRGB {r['chan_delta']}  "
              f"HF ours/ref {r['hf_ours']:.5f}/{r['hf_ref']:.5f}",
              flush=True)
    path = os.path.join(ROOT, "docs", "validation",
                        "rnl_dragon_regions.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
