"""Same-process A/B/A of the corridor sort key (SORT_KEY_EXIT): origin ×
scene-exit-point Morton vs the legacy origin × direction code, on the
100k-triangle bench (the workload whose bounce unions the simulator
priced at 0.70-0.76× under the new key — cull_sim.py --simbin).

Run on the TPU chip: python scripts/ab_key.py [--side=N]
"""
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

import zig_raytracing_contest_tpu.render.wavefront as wf
from bench import build_large_scene
from zig_raytracing_contest_tpu.config import Config
from zig_raytracing_contest_tpu.render.pipeline import prepare_scene, render_scene


def main():
    side = 224
    for a in sys.argv[1:]:
        if a.startswith("--side="):
            side = int(a.split("=")[1])
    if "--official" in sys.argv:
        # Whole-path regime: the key is emitted IN-KERNEL
        # (fused._emit_sort_key, same flag) for the post-bounce-0 sort.
        from bench import build_bench_scene

        name = "official"
        cfg = Config(grid_resolution=(128, 128, 128), num_samples=3,
                     max_bounce=4, wave_size=1 << 19)
        with tempfile.TemporaryDirectory() as d:
            p = build_bench_scene(Path(d) / "s.gltf")
            scene, cam, _ = prepare_scene(str(p), cfg,
                                          camera_name="Camera 1",
                                          width=1920, height=1080)
    else:
        name = f"side={side}"
        cfg = Config(grid_resolution=(128, 128, 128), num_samples=2,
                     max_bounce=3, wave_size=1 << 21)
        with tempfile.TemporaryDirectory() as d:
            p = build_large_scene(Path(d) / "s.gltf", side=side)
            scene, cam, _ = prepare_scene(str(p), cfg,
                                          camera_name="Camera 1",
                                          width=1280, height=720)

    def measure():
        render_scene(scene, cam, cfg)  # warm/compile
        rates = []
        for _ in range(3):
            t0 = time.perf_counter()
            _, stats = render_scene(scene, cam, cfg)
            rates.append(stats.segments / (time.perf_counter() - t0) / 1e6)
        rates.sort()
        return rates[1], rates[-1]

    base = wf.SORT_KEY_EXIT
    for flag in (base, not base, base):
        wf.SORT_KEY_EXIT = flag
        jax.clear_caches()
        med, best = measure()
        print(f"{name} sort_key_exit={flag}: median {med:.3f}  "
              f"best {best:.3f} Mrays/s", flush=True)
    wf.SORT_KEY_EXIT = base
    return 0


if __name__ == "__main__":
    sys.exit(main())
