"""Micro-bench: cost of alive-partitioning a (16, R) ray state on-chip,
vs the full Morton sort, vs the trace savings it buys at ~12% alive.

Run: python scripts/micro_partition.py
"""

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from bench import build_bench_scene
from zig_raytracing_contest_tpu.config import Config
from zig_raytracing_contest_tpu.ops import rng
from zig_raytracing_contest_tpu.ops.mxu_intersect import trace_emit_aux
from zig_raytracing_contest_tpu.render import wavefront
from zig_raytracing_contest_tpu.render.pipeline import prepare_scene


def best_time(fn, n=10):
    jax.block_until_ready(fn())
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    R = 1 << 19
    cfg = Config(grid_resolution=(128, 128, 128))
    with tempfile.TemporaryDirectory() as d:
        p = build_bench_scene(Path(d) / "s.gltf")
        scene, cam, _ = prepare_scene(
            str(p), cfg, camera_name="Camera 1", width=1920, height=1080
        )

    local = jnp.arange(R, dtype=jnp.int32)
    streams = rng.ray_streams(jnp.uint32(0), local)
    # 12%-alive bounce-like state, dead scattered uniformly
    alive = rng.uniform(streams, 3) < 0.125
    g = jnp.stack([rng.normal3(streams, 9)[:, a] for a in range(3)], 0)
    g = g / jnp.sqrt((g * g).sum(0))
    span = (scene.grid.bbox_max - scene.grid.bbox_min)[:, None]
    org = scene.grid.bbox_min[:, None] + jnp.stack(
        [rng.uniform(streams, 20 + k) for k in range(3)], 0
    ) * span
    ones = jnp.ones((R,), jnp.float32)
    zeros = jnp.zeros((R,), jnp.float32)
    state = jnp.concatenate(
        [org, g, jnp.stack([ones] * 3 + [zeros] * 3),
         alive.astype(jnp.float32)[None],
         jax.lax.bitcast_convert_type(streams, jnp.float32)[None],
         jnp.zeros((2, R), jnp.float32)],
        axis=0,
    )

    @jax.jit
    def part_argsort(st):
        dead = (st[12] <= 0.0).astype(jnp.int32)
        perm = jnp.argsort(dead, stable=True)
        return jnp.take(st, perm, axis=1), perm

    @jax.jit
    def part_key_u32(st):
        # single u32 sort key (dead only), lax.sort of (key, iota)
        dead = (st[12] <= 0.0).astype(jnp.uint32)
        _, perm = jax.lax.sort((dead, local), num_keys=1, is_stable=True)
        return jnp.take(st, perm, axis=1), perm

    @jax.jit
    def full_sort(st):
        key = wavefront._ray_sort_key(scene, st)
        perm = jnp.argsort(key)
        return jnp.take(st, perm, axis=1), perm

    @jax.jit
    def take_only(st, perm):
        return jnp.take(st, perm, axis=1)

    t1 = best_time(lambda: part_argsort(state))
    t2 = best_time(lambda: part_key_u32(state))
    t3 = best_time(lambda: full_sort(state))
    _, perm = part_argsort(state)
    t4 = best_time(lambda: take_only(state, perm))

    print(f"partition argsort(stable)+take : {t1*1e3:7.2f} ms")
    print(f"partition lax.sort u32 + take  : {t2*1e3:7.2f} ms")
    print(f"full morton sort + take        : {t3*1e3:7.2f} ms")
    print(f"take(16,R) alone               : {t4*1e3:7.2f} ms")

    trace = jax.jit(lambda s: trace_emit_aux(scene.mxu, s,
                                             rec_table=scene.shade_table_t))
    st_c, _ = part_argsort(state)
    t_scattered = best_time(lambda: trace(state))
    t_compact = best_time(lambda: trace(st_c))
    print(f"trace scattered-12%-alive      : {t_scattered*1e3:7.2f} ms")
    print(f"trace compacted-12%-alive      : {t_compact*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
