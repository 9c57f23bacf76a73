"""Same-process official-scene wave-size comparison."""
import sys, tempfile, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import build_bench_scene
from zig_raytracing_contest_tpu.config import Config
from zig_raytracing_contest_tpu.render.pipeline import prepare_scene, render_scene

with tempfile.TemporaryDirectory() as d:
    p = build_bench_scene(Path(d) / "s.gltf")
    cfg0 = Config(grid_resolution=(128, 128, 128), num_samples=3, max_bounce=4)
    scene, cam, _ = prepare_scene(str(p), cfg0, camera_name="Camera 1",
                                  width=1920, height=1080)

for wave in (1 << 19, 1 << 20, 1 << 21, 1 << 19):
    cfg = Config(grid_resolution=(128, 128, 128), num_samples=3,
                 max_bounce=4, wave_size=wave)
    render_scene(scene, cam, cfg)  # warm
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        _, stats = render_scene(scene, cam, cfg)
        best = max(best, stats.segments / (time.perf_counter() - t0) / 1e6)
    print(f"wave={wave}: {best:.3f} Mrays/s", flush=True)
