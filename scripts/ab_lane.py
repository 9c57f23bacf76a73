"""Same-process A/B of LANE_BLOCK for the sorted large-scene regime."""
import sys, tempfile, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import zig_raytracing_contest_tpu.ops.mxu_intersect as mi
import zig_raytracing_contest_tpu.render.wavefront as wf
from bench import build_large_scene
from zig_raytracing_contest_tpu.config import Config
from zig_raytracing_contest_tpu.render.pipeline import prepare_scene, render_scene

cfg = Config(grid_resolution=(128, 128, 128), num_samples=2, max_bounce=3,
             wave_size=1 << 21)
with tempfile.TemporaryDirectory() as d:
    p = build_large_scene(Path(d) / "s.gltf")
    scene, cam, _ = prepare_scene(str(p), cfg, camera_name="Camera 1",
                                  width=1280, height=720)

for lb in (512, 256, 512, 256):
    mi.LANE_BLOCK = lb
    wf.render_frame_chunk._clear_cache()
    mi.trace_emit_aux._clear_cache()
    render_scene(scene, cam, cfg)  # warm
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        _, stats = render_scene(scene, cam, cfg)
        best = max(best, stats.segments / (time.perf_counter() - t0) / 1e6)
    print(f"lane_block={lb}: {best:.3f} Mrays/s", flush=True)
