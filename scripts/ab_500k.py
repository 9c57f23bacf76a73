"""Root-cause the 500k 'regression' (VERDICT r3 item 4): r2 recorded
1.10 Mrays/s, the r3 battery 0.96 — but the determinism fix
EXCLUDE_PREV_HIT (commit 331b438) landed BETWEEN those measurements and
costs ~12% on the official bench (docs/PERFORMANCE.md).  1.10 x 0.88 =
0.97 ~= 0.96, so the hypothesis is: no code regression — the r2 number
was measured at pre-fix semantics.  This prices the flag on the exact
500k protocol in ONE process (A/B/A to bound drift).

Run on the TPU chip: python scripts/ab_500k.py
"""
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

import zig_raytracing_contest_tpu.ops.mxu_intersect as mi
from bench import build_large_scene
from zig_raytracing_contest_tpu.config import Config
from zig_raytracing_contest_tpu.render.pipeline import prepare_scene, render_scene


def main():
    # The ACTUAL r2/r3 battery protocol for --side=500: 1280x720, 2 spp,
    # 3 bounces, wave 2^18 (large_sweep.py's huge=side>500 cut excludes
    # 500; PERFORMANCE.md long mis-described this row as 640x360/1spp —
    # corrected this round).  2*500^2 = 500,000 tris, streaming kernel.
    cfg = Config(grid_resolution=(128, 128, 128), num_samples=2,
                 max_bounce=3, wave_size=1 << 18)
    with tempfile.TemporaryDirectory() as d:
        p = build_large_scene(Path(d) / "s.gltf", side=500)
        scene, cam, _ = prepare_scene(str(p), cfg, camera_name="Camera 1",
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

    base = mi.EXCLUDE_PREV_HIT
    for flag in (base, not base, base):
        mi.EXCLUDE_PREV_HIT = flag
        jax.clear_caches()
        med, best = measure()
        print(f"500k exclude_prev_hit={flag}: median {med:.3f}  "
              f"best {best:.3f} Mrays/s", flush=True)
    mi.EXCLUDE_PREV_HIT = base
    return 0


if __name__ == "__main__":
    sys.exit(main())
