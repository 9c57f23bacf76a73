"""Reproduce the 28ms-vs-0.07ms trace gap: real bench bank + camera rays
vs random bank + random rays, one harness.  Scratch tooling."""

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from zig_raytracing_contest_tpu.ops import mxu_intersect as mi
from zig_raytracing_contest_tpu.ops import rng, linalg
from zig_raytracing_contest_tpu.render import wavefront
from zig_raytracing_contest_tpu.config import Config
from zig_raytracing_contest_tpu.render.pipeline import prepare_scene
from bench import build_bench_scene

R = 1 << 18


def best_time(fn, n=10):
    fn()
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def rand_bank(T=1024, seed=0):
    g = np.random.default_rng(seed)
    return mi.bake_triangles(
        g.uniform(-8, 8, (T, 3)), g.uniform(-0.5, 0.5, (T, 3)),
        g.uniform(-0.5, 0.5, (T, 3)))


def rand_state(seed=1):
    g = np.random.default_rng(seed)
    st = np.zeros((16, R), np.float32)
    st[0:3] = g.uniform(-8, 8, (3, R))
    d = g.standard_normal((3, R))
    st[3:6] = d / np.linalg.norm(d, axis=0, keepdims=True)
    st[6:9] = 1.0
    st[12] = 1.0
    return jnp.asarray(st)


def main():
    cfg = Config(grid_resolution=(128, 128, 128))
    with tempfile.TemporaryDirectory() as d:
        p = build_bench_scene(Path(d) / "s.gltf")
        scene, cam, _ = prepare_scene(str(p), cfg, camera_name="Camera 1",
                                      width=1280, height=720)
    local = jnp.arange(R, dtype=jnp.int32)
    streams = rng.ray_streams(jnp.uint32(0), local)
    _, x, y = wavefront.wave_pixel_coords(local, 1, 1280, jnp.int32(0))
    jx, jy = rng.uniform2_soa(streams, 0)
    llc = jnp.asarray(cam.lower_left_corner)
    direction = linalg.normalize(
        llc + jnp.asarray(cam.right) * (x + jx)[:, None]
        + jnp.asarray(cam.up) * (y + jy)[:, None])
    orig = jnp.broadcast_to(jnp.asarray(cam.origin), direction.shape)
    st_cam = jnp.concatenate(
        [orig.T, direction.T, jnp.ones((3, R), jnp.float32),
         jnp.zeros((3, R), jnp.float32),
         jnp.ones((1, R), jnp.float32),
         jax.lax.bitcast_convert_type(streams, jnp.float32)[None],
         jnp.zeros((2, R), jnp.float32)], axis=0)

    st_rand = rand_state()
    bank_r = rand_bank()
    bank_s = scene.mxu
    print("bench bank Tp", bank_s.tri_data.shape, "tiles",
          bank_s.tile_bbox.shape, "groups", bank_s.group_bbox.shape)
    print("rand  bank Tp", bank_r.tri_data.shape, "tiles",
          bank_r.tile_bbox.shape, "groups", bank_r.group_bbox.shape)

    for bname, bank in (("bench", bank_s), ("rand", bank_r)):
        for sname, st in (("cam", st_cam), ("rand", st_rand)):
            aux, idx, _ = mi.trace_emit_aux(bank, st)
            hits = int(jnp.sum(jnp.isfinite(aux[2])))
            t = best_time(lambda: mi.trace_emit_aux(bank, st))
            print(f"bank={bname:5s} rays={sname:4s}: {t*1e3:7.2f} ms"
                  f"  hits={hits}/{R}")


if __name__ == "__main__":
    main()
