"""Same-process A/B of the bounce-0 split sort on the official scene."""
import sys, tempfile, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import zig_raytracing_contest_tpu.render.wavefront as wf
from bench import build_bench_scene
from zig_raytracing_contest_tpu.config import Config
from zig_raytracing_contest_tpu.render.pipeline import prepare_scene, render_scene

cfg = Config(grid_resolution=(128, 128, 128), num_samples=3, max_bounce=4,
             wave_size=1 << 19)
with tempfile.TemporaryDirectory() as d:
    p = build_bench_scene(Path(d) / "s.gltf")
    scene, cam, _ = prepare_scene(str(p), cfg, camera_name="Camera 1",
                                  width=1920, height=1080)

for flag in (True, False, True, False):
    wf.SORT_AFTER_BOUNCE0 = flag
    # render_wave is traced inside render_frame_chunk's jit; the flag is
    # not a cache key, so force a retrace per variant.
    wf.render_frame_chunk._clear_cache()
    render_scene(scene, cam, cfg)  # warm (compiles each variant once)
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        _, stats = render_scene(scene, cam, cfg)
        best = max(best, stats.segments / (time.perf_counter() - t0) / 1e6)
    print(f"sort_after_b0={flag}: {best:.3f} Mrays/s", flush=True)
