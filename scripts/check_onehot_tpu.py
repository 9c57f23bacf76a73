"""On-chip bit-exactness check: the one-hot MXU record matmul in the
resident trace kernel must equal the XLA gather bit-for-bit on real TPU
hardware (interpret-mode equality is already pinned in tests/test_fused.py;
this validates Mosaic's f32 matmul path).  Scratch tooling."""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_bench_scene
from zig_raytracing_contest_tpu.config import Config
from zig_raytracing_contest_tpu.ops import linalg, rng
from zig_raytracing_contest_tpu.ops.mxu_intersect import trace_emit_aux
from zig_raytracing_contest_tpu.render import wavefront
from zig_raytracing_contest_tpu.render.pipeline import prepare_scene

R = 1 << 15


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    cfg = Config(grid_resolution=(128, 128, 128))
    with tempfile.TemporaryDirectory() as d:
        p = build_bench_scene(Path(d) / "s.gltf")
        scene, cam, _ = prepare_scene(str(p), cfg, camera_name="Camera 1",
                                      width=640, height=360)
    local = jnp.arange(R, dtype=jnp.int32)
    streams = rng.ray_streams(jnp.uint32(0), local)
    _, x, y = wavefront.wave_pixel_coords(local, 1, 640, jnp.int32(0))
    jx, jy = rng.uniform2_soa(streams, 0)
    direction = linalg.normalize(
        jnp.asarray(cam.lower_left_corner)
        + jnp.asarray(cam.right) * (x + jx)[:, None]
        + jnp.asarray(cam.up) * (y + jy)[:, None])
    orig = jnp.broadcast_to(jnp.asarray(cam.origin), direction.shape)
    state = jnp.concatenate(
        [orig.T, direction.T, jnp.ones((3, R), jnp.float32),
         jnp.zeros((3, R), jnp.float32), jnp.ones((1, R), jnp.float32),
         jax.lax.bitcast_convert_type(streams, jnp.float32)[None],
         jnp.zeros((2, R), jnp.float32)], axis=0)

    aux, idx_m, rec = trace_emit_aux(scene.mxu, state,
                                     rec_table=scene.shade_table_t)
    assert rec is not None
    gathered = jnp.take(scene.shade_table_t, idx_m, axis=1)
    hit = np.isfinite(np.asarray(aux[2]))
    r = np.asarray(rec)[:, hit]
    g = np.asarray(gathered)[:, hit]
    exact = np.array_equal(r, g)
    print(f"hits={int(hit.sum())}/{R} bit-exact={exact}")
    if not exact:
        bad = np.nonzero(r != g)
        print("first mismatches:", r[bad][:5], g[bad][:5])
        sys.exit(1)
    miss = np.asarray(rec)[:, ~hit]
    print("missed-ray records all zero:", bool((miss == 0).all()))


if __name__ == "__main__":
    main()
