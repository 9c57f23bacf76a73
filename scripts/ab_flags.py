"""Same-process A/B of the round-3 trace-kernel flags on the official and
100k scenes: GATE_WINNER_EXTRACT (winner folding only when a lane improved)
and REC_EMIT_DEFERRED (post-traversal record extraction).

Run on the TPU chip:  python scripts/ab_flags.py [--large-only|--official-only]

Each variant forces a full retrace (the flags are module constants, not
cache keys), so expect one big Mosaic compile per variant (~2-4 min on the
tunneled chip).  Order: production defaults first, then one flag off at a
time — the deltas attribute the end-to-end effect per flag.
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

    from zig_raytracing_contest_tpu.render import fused

    # One flag flipped per variant, starting from the CURRENT production
    # defaults (read off the modules, so this script never goes stale when
    # a default changes).  EXCLUDE_PREV_HIT changes the rendered output
    # (it is a determinism fix, not a pure optimization) — its row exists
    # to price the fix, not to choose a default.
    defaults = {
        # Flip order = measurement priority (the chip session bounds this
        # script with a timeout; the most load-bearing rows go first).
        "prev": mi.EXCLUDE_PREV_HIT,
        "gate": mi.GATE_WINNER_EXTRACT,
        "defer": mi.REC_EMIT_DEFERRED,
        "so": fused.SHARED_ORIGIN_B0,
    }

    def apply(flags):
        mi.GATE_WINNER_EXTRACT = flags["gate"]
        mi.REC_EMIT_DEFERRED = flags["defer"]
        fused.SHARED_ORIGIN_B0 = flags["so"]
        mi.EXCLUDE_PREV_HIT = flags["prev"]

    variants = [("defaults " + str(defaults), defaults)]
    for key in defaults:
        flipped = dict(defaults)
        flipped[key] = not flipped[key]
        variants.append((f"{key}={flipped[key]}", flipped))

    for label, flags in variants:
        apply(flags)
        jax.clear_caches()
        for name, sc, cam, cfg in workloads:
            # REC_EMIT_DEFERRED only matters when the table is VMEM-resident
            # (> REC_EMIT_MAX_TRIS forces deferral regardless of the flag) —
            # skip rows where the flag cannot change the kernel.
            if (not flags["defer"]
                    and sc.mxu.tri_data.shape[1] > mi.REC_EMIT_MAX_TRIS):
                print(f"{name:9s} {label}: skipped (table_hbm forces "
                      f"deferral)", flush=True)
                continue
            med, best = measure(sc, cam, cfg)
            print(f"{name:9s} {label}: median {med:.3f}  best {best:.3f} "
                  f"Mrays/s", flush=True)
    apply(defaults)
    return 0


if __name__ == "__main__":
    sys.exit(main())
