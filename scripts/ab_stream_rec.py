"""Same-process A/B of the streaming-path suspects on a 2M-triangle scene.

Round-3 chip session showed the 2M streaming smoke at ~0.48 Mrays/s vs the
~1.5-1.8 measured mid-round BEFORE two unmeasured-on-chip changes landed:
in-kernel record/u-v emission for streaming scenes and the shared-origin
bounce 0.  This isolates each:

  1. production defaults (rec in-kernel, shared-origin on)
  2. STREAM_REC_IN_KERNEL=False  -> XLA record gather + recompute_uv
  3. SHARED_ORIGIN_B0=False      -> per-lane origin rows at bounce 0

Run on the TPU chip:  python scripts/ab_stream_rec.py [--side=N]
"""
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

side = 1000
for a in sys.argv[1:]:
    if a.startswith("--side="):
        side = int(a.split("=")[1])

import zig_raytracing_contest_tpu.ops.mxu_intersect as mi
import zig_raytracing_contest_tpu.render.wavefront as wf
from bench import build_large_scene
from zig_raytracing_contest_tpu.config import Config
from zig_raytracing_contest_tpu.render import fused
from zig_raytracing_contest_tpu.render.pipeline import (
    prepare_scene,
    render_scene,
)


def measure(scene, cam, cfg, reps=3):
    render_scene(scene, cam, cfg)  # warm/compile
    rates = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _, stats = render_scene(scene, cam, cfg)
        rates.append(stats.segments / (time.perf_counter() - t0) / 1e6)
    rates.sort()
    return rates[len(rates) // 2], rates[-1]


def main():
    huge = side > 500
    cfg = Config(grid_resolution=(128, 128, 128),
                 num_samples=1 if huge else 2,
                 max_bounce=2 if huge else 3, wave_size=1 << 18)
    w, h = (640, 360) if huge else (1280, 720)
    with tempfile.TemporaryDirectory() as d:
        p = build_large_scene(Path(d) / "s.gltf", side=side)
        scene, cam, _ = prepare_scene(str(p), cfg, camera_name="Camera 1",
                                      width=w, height=h)
    print(f"side={side} tris={scene.mxu.tri_data.shape[1]} "
          f"tile={scene.mxu.tile} tiles={scene.mxu.tile_bbox.shape[1]}")

    variants = [
        ("defaults (rec-in-kernel, so=T, prev=T)", True, True, True),
        ("prev=F (EXCLUDE_PREV_HIT off)", True, True, False),
        ("rec=gather (STREAM_REC_IN_KERNEL=F)", False, True, True),
        ("so=F (per-lane bounce-0 origin)", True, False, True),
    ]
    for label, rec_ink, so, prev in variants:
        wf.STREAM_REC_IN_KERNEL = rec_ink
        fused.SHARED_ORIGIN_B0 = so
        mi.EXCLUDE_PREV_HIT = prev
        jax.clear_caches()
        med, best = measure(scene, cam, cfg)
        print(f"{label}: median {med:.3f}  best {best:.3f} Mrays/s",
              flush=True)
    wf.STREAM_REC_IN_KERNEL = True
    fused.SHARED_ORIGIN_B0 = True
    mi.EXCLUDE_PREV_HIT = True
    return 0


if __name__ == "__main__":
    sys.exit(main())
