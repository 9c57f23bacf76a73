"""Cull-efficiency diagnostic: mean triangle tiles swept per ray block, per
bounce, on the real bench scenes (aux row 5 from the trace kernels).

Run: python scripts/cull_stats.py [--large] [--side=N] [--sort | --nosort]
     [--nsb=N]   (sets SUBBEAM_TRAVERSE for the run — counter decomposition
                  of the per-sub-beam traversal lever)

--side=N overrides the terrain size of the --large scene (2*N^2 triangles;
implies --large), for the 500k/2M/4M streaming-regime curve.
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from bench import build_bench_scene, build_large_scene
from zig_raytracing_contest_tpu.config import Config
from zig_raytracing_contest_tpu.ops import rng
from zig_raytracing_contest_tpu.ops.mxu_intersect import trace_emit_aux
from zig_raytracing_contest_tpu.render import wavefront
from zig_raytracing_contest_tpu.render.fused import shade_fused
from zig_raytracing_contest_tpu.render.pipeline import prepare_scene


def main():
    side = None
    for a in sys.argv[1:]:
        if a.startswith("--side="):
            side = int(a.split("=")[1])
        if a.startswith("--nsb="):
            import zig_raytracing_contest_tpu.ops.mxu_intersect as mi
            mi.SUBBEAM_TRAVERSE = int(a.split("=")[1])
    sponza = "--sponza" in sys.argv
    large = "--large" in sys.argv or side is not None or sponza
    R = (1 << 18 if (side and side > 500) or sponza else 1 << 21) if large else 1 << 18
    width = 640 if side and side > 500 else 1280
    height = 360 if side and side > 500 else 720
    cfg = Config(grid_resolution=(128, 128, 128))
    with tempfile.TemporaryDirectory() as d:
        if sponza:
            # The measured Sponza row's scene (docs/ROUND4.md item 5).
            sys.path.insert(0, str(Path(__file__).resolve().parent))
            from sponza_builder import write_sponza_glb

            p = write_sponza_glb(Path(d) / "s.glb", detail=1.25)
            scene, cam, _ = prepare_scene(str(p), cfg,
                                          camera_name="Camera 1", height=720)
        else:
            if large:
                p = build_large_scene(Path(d) / "s.gltf", side=side or 224)
            else:
                p = build_bench_scene(Path(d) / "s.gltf")
            scene, cam, _ = prepare_scene(
                str(p), cfg, camera_name="Camera 1", width=width, height=height
            )
    if sponza:
        width, height = cam.width, cam.height
    tiles = scene.mxu.tile_bbox.shape[1]
    groups = scene.mxu.group_bbox.shape[1]
    sort_rays = scene.mxu.tri_data.shape[1] > wavefront.SORT_MIN_TRIS
    if "--sort" in sys.argv:
        sort_rays = True
    if "--nosort" in sys.argv:
        sort_rays = False
    # Echo the EFFECTIVE nsb (after the kernel's lane-alignment check —
    # mxu_intersect._trace_body_resident falls back to whole-block when
    # LANE_BLOCK % (nsb*128) != 0) so saved logs from different
    # SUBBEAM_TRAVERSE runs are distinguishable (ADVICE r3).
    import zig_raytracing_contest_tpu.ops.mxu_intersect as mi
    nsb_req = mi.SUBBEAM_TRAVERSE
    tri_n = scene.mxu.tri_data.shape[1]
    lb = (  # same selection as mxu_intersect.trace_emit_aux
        mi.LANE_BLOCK_RESIDENT
        if tri_n <= mi.VMEM_RESIDENT_MAX_TRIS
        and tri_n <= mi.VMEM_WIDE_BLOCK_MAX_TRIS
        and R % mi.LANE_BLOCK_RESIDENT == 0
        else mi.LANE_BLOCK
    )
    nsb_eff = nsb_req if (nsb_req > 1 and lb % (nsb_req * 128) == 0) else 1
    print(f"scene={'large' if large else 'bench'} tiles={tiles} groups={groups} "
          f"R={R} sort={sort_rays} nsb={nsb_eff}"
          + (f" (requested {nsb_req}, not lane-aligned)"
             if nsb_eff != nsb_req else ""))

    local = jnp.arange(R, dtype=jnp.int32)
    streams = rng.ray_streams(jnp.uint32(0), local)
    _, x, y = wavefront.wave_pixel_coords(local, 1, width, jnp.int32(0))
    jx, jy = rng.uniform2_soa(streams, 0)
    llc = jnp.asarray(cam.lower_left_corner)
    dr = [llc[a] + cam.right[a] * (x + jx) + cam.up[a] * (y + jy) for a in range(3)]
    inv_len = 1.0 / jnp.sqrt(dr[0] ** 2 + dr[1] ** 2 + dr[2] ** 2)
    ones = jnp.ones((R,), jnp.float32)
    zeros = jnp.zeros((R,), jnp.float32)
    state = jnp.stack(
        [
            cam.origin[0] * ones, cam.origin[1] * ones, cam.origin[2] * ones,
            dr[0] * inv_len, dr[1] * inv_len, dr[2] * inv_len,
            ones, ones, ones, zeros, zeros, zeros,
            ones, jax.lax.bitcast_convert_type(streams, jnp.float32),
            zeros, zeros,
        ],
        axis=0,
    )

    import time

    trace = jax.jit(lambda s: trace_emit_aux(scene.mxu, s,
                                             rec_table=scene.shade_table_t))

    def best_time(fn, n=6):
        jax.block_until_ready(fn())
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            best = min(best, time.perf_counter() - t0)
        return best

    from zig_raytracing_contest_tpu.ops.mxu_intersect import (
        LANE_BLOCK, LANE_BLOCK_RESIDENT, VMEM_WIDE_BLOCK_MAX_TRIS)

    lb = (LANE_BLOCK_RESIDENT
          if scene.mxu.tri_data.shape[1] <= VMEM_WIDE_BLOCK_MAX_TRIS
          else LANE_BLOCK)
    for bounce in range(4):
        if sort_rays:
            key = wavefront._ray_sort_key(scene, state)
            state = jnp.take(state, jnp.argsort(key), axis=1)
        t_tr = best_time(lambda: trace(state))
        aux, tri, rec = trace(state)
        st_in = state
        t_sh = best_time(lambda: shade_fused(scene, st_in, aux, tri, bounce,
                                             block_skip=sort_rays, rec=rec))
        swept = aux[5]
        expans = aux[6]
        alive = aux[4] > 0.0
        n_alive = int(alive.sum())
        blocks_live = jnp.any(alive.reshape(-1, lb), axis=1)
        mean_alive = float(jnp.where(alive, swept, 0.0).sum()) / max(n_alive, 1)
        mean_exp = float(jnp.where(alive, expans, 0.0).sum()) / max(n_alive, 1)
        print(
            f"bounce {bounce}: alive {n_alive:7d}/{R} | live blocks "
            f"{int(blocks_live.sum()):4d}/{blocks_live.shape[0]} (lb={lb}) | "
            f"swept/alive-ray {mean_alive:6.2f} of {tiles} | "
            f"tree expansions {mean_exp:6.2f} | "
            f"trace {t_tr*1e3:7.2f} ms  shade {t_sh*1e3:6.2f} ms"
        )
        state = shade_fused(scene, state, aux, tri, bounce,
                            block_skip=sort_rays, rec=rec)


if __name__ == "__main__":
    main()
