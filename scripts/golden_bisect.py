"""Bisect the on-chip alpha_modes golden failure across round-3 features.

Renders alpha_modes (the failing golden) at 64 spp on the TPU under one
feature toggled off at a time and reports mean |diff| vs the committed
CPU golden.  The variant that restores mean < 1/255 names the culprit.

Run on a TPU host:  python scripts/golden_bisect.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np
from PIL import Image

import zig_raytracing_contest_tpu.ops.mxu_intersect as mi
import zig_raytracing_contest_tpu.render.wavefront as wf
from zig_raytracing_contest_tpu.config import Config
from zig_raytracing_contest_tpu.render import fused
from zig_raytracing_contest_tpu.render.pipeline import (
    prepare_scene,
    render_scene,
)

ASSETS = Path(__file__).resolve().parent.parent / "tests" / "assets"


def render(scene, cam, cfg):
    img, _ = render_scene(scene, cam, cfg)
    return np.asarray(img)


def main() -> int:
    cfg = Config(grid_resolution=(16, 16, 16), num_samples=64, max_bounce=3,
                 seed=12345)
    scene, cam, _ = prepare_scene(str(ASSETS / "alpha_modes.gltf"), cfg,
                                  width=128, height=96)
    ref = np.asarray(Image.open(ASSETS / "golden64_alpha_modes.png"))
    print(f"bank: onehot={scene.color_u16f_t is not None} "
          f"paged={scene.color_paged_t is not None}")

    def measure(label, sc):
        jax.clear_caches()
        img = render(sc, cam, cfg)
        diff = np.abs(img.astype(int) - ref.astype(int))
        print(f"{label}: mean |diff| {diff.mean():.3f}/255, "
              f"pixels >3: {(diff > 3).mean():.2%}", flush=True)

    measure("defaults", scene)

    # 1. No single-kernel bank: per-bounce pipeline with XLA texel gathers
    #    (the pre-paged-bank regime for this scene).
    measure("bank=None (XLA texel gather)",
            scene._replace(color_paged_t=None, color_u16f_t=None))

    # 2. Shared-origin bounce 0 off.
    fused.SHARED_ORIGIN_B0 = False
    measure("SHARED_ORIGIN_B0=False", scene)
    fused.SHARED_ORIGIN_B0 = True

    # 3. Survivor beam-sort off (single whole-path call).
    wf.SORT_AFTER_BOUNCE0 = False
    measure("SORT_AFTER_BOUNCE0=False", scene)
    wf.SORT_AFTER_BOUNCE0 = True

    # 4. Winner-fold gating off.
    mi.GATE_WINNER_EXTRACT = False
    measure("GATE_WINNER_EXTRACT=False", scene)
    mi.GATE_WINNER_EXTRACT = True

    # 5. Deferred record extraction off.
    mi.REC_EMIT_DEFERRED = False
    measure("REC_EMIT_DEFERRED=False", scene)
    mi.REC_EMIT_DEFERRED = True
    return 0


if __name__ == "__main__":
    sys.exit(main())
