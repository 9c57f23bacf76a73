"""Quantify on-TPU trace-kernel precision vs the exact-f32 XLA tile scan.

The kernel's transform applications run as dot_generals; if Mosaic lowers
them at default precision (bf16 single pass), t/u/v lose ~16 mantissa bits
vs the elementwise XLA path.  Scratch tooling."""

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
from zig_raytracing_contest_tpu.ops.mxu_intersect import (
    nearest_hit_xla,
    trace_emit_aux,
)
from zig_raytracing_contest_tpu.render import wavefront
from zig_raytracing_contest_tpu.render.pipeline import prepare_scene

R = 1 << 15


def main():
    assert jax.default_backend() == "tpu"
    cfg = Config(grid_resolution=(128, 128, 128))
    with tempfile.TemporaryDirectory() as d:
        p = build_bench_scene(Path(d) / "s.gltf")
        scene, cam, _ = prepare_scene(str(p), cfg, camera_name="Camera 1",
                                      width=256, height=128)
    local = jnp.arange(R, dtype=jnp.int32)
    streams = rng.ray_streams(jnp.uint32(0), local)
    _, x, y = wavefront.wave_pixel_coords(local, 1, 256, jnp.int32(0))
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

    aux, idx_m, _ = trace_emit_aux(scene.mxu, state)
    t_k = np.asarray(aux[2])
    u_k = np.asarray(aux[0])
    # exact-f32 elementwise reference ON TPU (no dots)
    t_x, i_x, u_x, v_x = jax.jit(nearest_hit_xla)(
        scene.mxu, orig, direction, jnp.ones(R, bool))
    t_x = np.asarray(t_x)
    u_x = np.asarray(u_x)
    hit = np.isfinite(t_x) & np.isfinite(t_k)
    dt = np.abs(t_k[hit] - t_x[hit]) / np.maximum(np.abs(t_x[hit]), 1e-9)
    du = np.abs(u_k[hit] - np.asarray(u_x)[hit])
    same_winner = np.mean(np.asarray(i_x)[hit] == np.asarray(idx_m)[hit])
    print(f"hits={int(hit.sum())}  t rel-err max={dt.max():.3e} "
          f"median={np.median(dt):.3e}")
    print(f"u abs-err max={du.max():.3e}  same-winner={same_winner:.4f}")
    print(f"hit-count kernel={int(np.isfinite(t_k).sum())} "
          f"xla={int(np.isfinite(t_x).sum())}")


if __name__ == "__main__":
    main()
