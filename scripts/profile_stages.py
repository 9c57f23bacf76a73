"""Per-stage device timing for the fused pipeline on the real chip.

Times trace / shade / sort / full-wave separately (block_until_ready, best
of N) on the official bench scene and the 100k-triangle large scene, for
primary and bounce-1 ray distributions.  Run directly:

    python scripts/profile_stages.py [--large]
"""

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from bench import build_bench_scene, build_large_scene
from zig_raytracing_contest_tpu.config import Config
from zig_raytracing_contest_tpu.render.pipeline import prepare_scene
from zig_raytracing_contest_tpu.render import wavefront
from zig_raytracing_contest_tpu.render.fused import shade_fused
from zig_raytracing_contest_tpu.ops.mxu_intersect import trace_emit_aux
from zig_raytracing_contest_tpu.ops import rng


def best_time(fn, n=8):
    fn()  # compile
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    large = "--large" in sys.argv
    R = 1 << 18
    cfg = Config(grid_resolution=(128, 128, 128))
    with tempfile.TemporaryDirectory() as d:
        p = (build_large_scene if large else build_bench_scene)(Path(d) / "s.gltf")
        scene, cam, _ = prepare_scene(
            str(p), cfg, camera_name="Camera 1", width=1280, height=720
        )
    print(f"scene: {'large' if large else 'bench'};"
          f" bank tiles={scene.mxu.tile_bbox.shape[1]}"
          f" groups={scene.mxu.group_bbox.shape[1]} R={R}")

    local = jnp.arange(R, dtype=jnp.int32)
    streams = rng.ray_streams(jnp.uint32(0), local)
    _, x, y = wavefront.wave_pixel_coords(local, 1, 1280, jnp.int32(0))
    jx, jy = rng.uniform2_soa(streams, 0)
    llc = jnp.asarray(cam.lower_left_corner)
    direction = llc + jnp.asarray(cam.right) * (x + jx)[:, None] + jnp.asarray(
        cam.up
    ) * (y + jy)[:, None]
    from zig_raytracing_contest_tpu.ops import linalg

    direction = linalg.normalize(direction)
    orig = jnp.broadcast_to(jnp.asarray(cam.origin), direction.shape)

    def state_of(o, dr, alive):
        return jnp.concatenate(
            [
                o.T, dr.T,
                jnp.ones((3, R), jnp.float32),
                jnp.zeros((3, R), jnp.float32),
                alive.astype(jnp.float32)[None],
                jax.lax.bitcast_convert_type(streams, jnp.float32)[None],
                jnp.zeros((2, R), jnp.float32),
            ],
            axis=0,
        )

    st_primary = state_of(orig, direction, jnp.ones(R, bool))
    # bounce-like: random origins inside bbox, random dirs, 50% dead
    g = rng.normal3(streams, 9)
    rnd_dir = linalg.normalize(g)
    span = scene.grid.bbox_max - scene.grid.bbox_min
    u3 = jnp.stack([rng.uniform(streams, k + 20) for k in range(3)], -1)
    rnd_org = scene.grid.bbox_min + u3 * span
    alive_half = rng.uniform(streams, 30) < 0.5
    st_bounce = state_of(rnd_org, rnd_dir, alive_half)

    trace = jax.jit(lambda s: trace_emit_aux(scene.mxu, s))
    key_fn = jax.jit(lambda s: wavefront._ray_sort_key(scene, s))
    sort_fn = jax.jit(
        lambda s: jnp.take(s, jnp.argsort(wavefront._ray_sort_key(scene, s)), axis=1)
    )

    for name, st in [("primary", st_primary), ("bounce-mix", st_bounce)]:
        st_sorted = sort_fn(st)
        t_tr = best_time(lambda: trace(st))
        t_trs = best_time(lambda: trace(st_sorted))
        aux, tri, _ = trace(st_sorted)
        t_sh = best_time(lambda: shade_fused(scene, st_sorted, aux, tri, 1))
        t_so = best_time(lambda: sort_fn(st))
        mr = R / 1e6
        print(
            f"{name:10s} trace {t_tr*1e3:7.2f} ms ({mr/t_tr:6.1f} Mray/s) | "
            f"trace(sorted) {t_trs*1e3:7.2f} ms ({mr/t_trs:6.1f}) | "
            f"shade {t_sh*1e3:6.2f} ms | sort {t_so*1e3:6.2f} ms"
        )


if __name__ == "__main__":
    main()
