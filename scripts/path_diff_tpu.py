"""End-to-end path comparison for the alpha_modes on-chip golden failure.

stage_diff_tpu.py showed compiled-vs-interpret of each fused stage matches
to 1e-5 with identical winner ids/records — so the Mosaic lowering is not
grossly wrong.  The remaining suspects are PATH-level: the CPU golden was
rendered through the XLA shading path (use_fused auto-Falses off-TPU),
while the chip renders the fused path.  This renders alpha_modes at 64 spp
ON THE TPU through:

  1. the XLA path (use_fused=False — no Pallas at all),
  2. the fused path (production, compiled),

and diffs each against the committed CPU golden and against each other.
If (1) also diverges from the golden, the gap is XLA:TPU-vs-XLA:CPU in the
shared code (RNG/accumulate/encode), not the kernels.  If only (2)
diverges, the fused path's SEMANTICS differ from the XLA path on real
hardware despite matching in interpret mode.

Run on a TPU host:  python scripts/path_diff_tpu.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
from PIL import Image

from zig_raytracing_contest_tpu.config import Config
from zig_raytracing_contest_tpu.render.pipeline import (
    prepare_scene,
    render_scene,
)

ASSETS = Path(__file__).resolve().parent.parent / "tests" / "assets"


def main() -> int:
    cfg = Config(grid_resolution=(16, 16, 16), num_samples=64, max_bounce=3,
                 seed=12345)
    scene, cam, _ = prepare_scene(str(ASSETS / "alpha_modes.gltf"), cfg,
                                  width=128, height=96)
    ref = np.asarray(Image.open(ASSETS / "golden64_alpha_modes.png"))

    imgs = {}
    for label, fused in (("xla", False), ("fused", None)):
        img, _ = render_scene(scene, cam, cfg, use_fused=fused)
        imgs[label] = np.asarray(img)

    def report(tag, a, b):
        d = np.abs(a.astype(int) - b.astype(int))
        print(f"{tag}: mean |diff| {d.mean():.3f}/255, "
              f"pixels >3: {(d > 3).mean():.2%}", flush=True)

    report("xla(TPU)   vs golden(CPU)", imgs["xla"], ref)
    report("fused(TPU) vs golden(CPU)", imgs["fused"], ref)
    report("fused(TPU) vs xla(TPU)   ", imgs["fused"], imgs["xla"])
    return 0


if __name__ == "__main__":
    sys.exit(main())
