"""Sweep TRI_TILE (bake + kernel tile size) on the official bench scene.

Finer tiles give the per-block AABB culls tighter boxes (fewer triangles
swept per ray) at roughly equal bulk VPU cost.  Patches the module
constants before scene build + first trace, so bake and kernels agree.

Run: python scripts/tile_sweep.py 64 [--large]
"""

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

tile = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 256
group = 8
f2bmin = None
lane = None
for a in sys.argv[2:]:
    if a.startswith("--group="):
        group = int(a.split("=")[1])
    if a.startswith("--f2bmin="):
        f2bmin = int(a.split("=")[1])
    if a.startswith("--lane="):
        lane = int(a.split("=")[1])

import zig_raytracing_contest_tpu.ops.mxu_intersect as mi

if f2bmin is not None:
    mi.F2B_MIN_GROUPS = f2bmin

if lane is not None:
    from functools import partial as _partial

    import zig_raytracing_contest_tpu.render.fused as rf

    rf.path_trace_fused = _partial(rf.path_trace_fused, lane_block=lane)

import zig_raytracing_contest_tpu.scene.types as st

_orig_bake = mi.bake_triangles
st.bake_triangles = lambda v0, e1, e2, **kw: _orig_bake(
    v0, e1, e2, tile=tile, group_tiles=group
)

from bench import build_bench_scene, build_large_scene  # noqa: E402
from zig_raytracing_contest_tpu.config import Config  # noqa: E402
from zig_raytracing_contest_tpu.render.pipeline import (  # noqa: E402
    prepare_scene,
    render_scene,
)


def main():
    large = "--large" in sys.argv
    if large:
        cfg = Config(grid_resolution=(128, 128, 128), num_samples=2,
                     max_bounce=3, wave_size=1 << 18)
        width, height = 1280, 720
    else:
        cfg = Config(grid_resolution=(128, 128, 128), num_samples=3,
                     max_bounce=4, wave_size=1 << 19)
        width, height = 1920, 1080
    with tempfile.TemporaryDirectory() as d:
        p = (build_large_scene if large else build_bench_scene)(Path(d) / "s.gltf")
        scene, cam, _ = prepare_scene(str(p), cfg, camera_name="Camera 1",
                                      width=width, height=height)
    print(f"tile={tile} group={group} tiles={scene.mxu.tile_bbox.shape[1]} "
          f"groups={scene.mxu.group_bbox.shape[1]}")
    render_scene(scene, cam, cfg)  # warm
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        _, stats = render_scene(scene, cam, cfg)
        wall = time.perf_counter() - t0
        best = max(best, stats.segments / wall / 1e6)
        print(f"rep {stats.segments / wall / 1e6:.3f} Mrays/s")
    print(f"BEST tile={tile} group={group}: {best:.3f} Mrays/s")


if __name__ == "__main__":
    main()
