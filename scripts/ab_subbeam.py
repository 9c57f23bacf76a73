"""Same-process A/B of SUBBEAM_TRAVERSE (independent per-sub-beam heap
walks in the resident tree path) on the official and 100k scenes.

The lane-level cull-union simulator (scripts/cull_sim.py, measured on real
bounce waves of the 100k scene) predicts: 512-lane unions of 75-103 tiles
shrink to 37-47 at 128 lanes — a 2.0-2.2x sweep-VECTOR-op cut at 4
sub-beams — against ~4x tree expansions (~0.5 us/step).  This script
prices the net effect end-to-end per value.

Run on the TPU chip:  python scripts/ab_subbeam.py [--large-only|--official-only]
                      [--nsb=2,4]   (default 1,2,4; one process per value is
                                     the timeout-safe pattern on the tunnel)

Note: the official bench scene has 7 tiles < TREE_MIN_TILES=16, so the
tree path (and therefore SUBBEAM_TRAVERSE) never engages there — its rows
only pin that the lever is a no-op on small scenes.
"""
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

import zig_raytracing_contest_tpu.ops.mxu_intersect as mi
from bench import build_bench_scene, build_large_scene
from zig_raytracing_contest_tpu.config import Config
from zig_raytracing_contest_tpu.render.pipeline import prepare_scene, render_scene


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
    do_official = "--large-only" not in sys.argv
    do_large = "--official-only" not in sys.argv

    workloads = []
    tmp = tempfile.mkdtemp()
    if do_official:
        cfg_o = Config(grid_resolution=(128, 128, 128), num_samples=3,
                       max_bounce=4, wave_size=1 << 19)
        p = build_bench_scene(Path(tmp) / "official.gltf")
        sc, cam, _ = prepare_scene(str(p), cfg_o, camera_name="Camera 1",
                                   width=1920, height=1080)
        workloads.append(("official", sc, cam, cfg_o))
    if do_large:
        cfg_l = Config(grid_resolution=(128, 128, 128), num_samples=2,
                       max_bounce=3, wave_size=1 << 21)
        p = build_large_scene(Path(tmp) / "large.gltf")
        sc, cam, _ = prepare_scene(str(p), cfg_l, camera_name="Camera 1",
                                   width=1280, height=720)
        workloads.append(("large", sc, cam, cfg_l))

    nsbs = (1, 2, 4)
    for a in sys.argv:
        if a.startswith("--nsb="):
            nsbs = tuple(int(x) for x in a[len("--nsb="):].split(","))
    # The kernel silently falls back to whole-block traversal when a
    # sub-beam is not lane-aligned (mxu_intersect._trace_body_resident:
    # nsb > 1 requires LANE_BLOCK % (nsb*128) == 0) — reject such values
    # up front so every printed row measures what it claims (ADVICE r3).
    for nsb in nsbs:
        if nsb > 1:
            for lb in (mi.LANE_BLOCK, mi.LANE_BLOCK_RESIDENT):
                if lb % (nsb * 128) != 0:
                    print(f"error: --nsb={nsb} is not lane-aligned for "
                          f"LANE_BLOCK={lb} (needs lb % (nsb*128) == 0); "
                          f"the kernel would silently run nsb=1",
                          file=sys.stderr)
                    return 2
    base = mi.SUBBEAM_TRAVERSE
    for nsb in nsbs:
        mi.SUBBEAM_TRAVERSE = nsb
        jax.clear_caches()
        for name, sc, cam, cfg in workloads:
            med, best = measure(sc, cam, cfg)
            print(f"{name:9s} subbeam={nsb}: median {med:.3f}  best {best:.3f} "
                  f"Mrays/s", flush=True)
    mi.SUBBEAM_TRAVERSE = base
    return 0


if __name__ == "__main__":
    sys.exit(main())
