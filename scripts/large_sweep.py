"""Large-scene config sweep: tree on/off, wave size, tile size.

Run: python scripts/large_sweep.py [--notree] [--wave=N] [--tile=N]
"""

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

wave = 1 << 18
tile = None
side = 224
for a in sys.argv[1:]:
    if a.startswith("--wave="):
        wave = int(a.split("=")[1])
    if a.startswith("--tile="):
        tile = int(a.split("=")[1])
    if a.startswith("--side="):
        side = int(a.split("=")[1])

import zig_raytracing_contest_tpu.ops.mxu_intersect as mi

if "--notree" in sys.argv:
    mi.TREE_MIN_TILES = 1 << 30
if "--nouv" in sys.argv:
    mi.EXTRACT_UV_IN_KERNEL = False
for a in sys.argv[1:]:
    if a.startswith("--subblock="):
        mi.SUBBLOCK_SWEEP = int(a.split("=")[1])

key = None
for a in sys.argv[1:]:
    if a.startswith("--key="):
        key = a.split("=")[1]

if key is not None:
    import jax.numpy as jnp

    import zig_raytracing_contest_tpu.render.wavefront as wf

    if key == "m5x5":
        # 5+5-bit interleaved 6-D Morton (30-bit key).
        def _key(scene, state):
            dead = (state[12] <= 0.0).astype(jnp.int32)
            span = jnp.maximum(scene.grid.bbox_max - scene.grid.bbox_min,
                               1e-30)
            rel = (state[0:3] - scene.grid.bbox_min[:, None]) / span[:, None]
            q = jnp.clip(rel * 32.0, 0.0, 31.0).astype(jnp.int32)
            dq = jnp.clip((state[3:6] + 1.0) * 16.0, 0.0, 31.0).astype(
                jnp.int32
            )
            keyv = jnp.zeros_like(dead)
            for b in range(5):
                for ax in range(3):
                    keyv = keyv | (((q[ax] >> b) & 1) << (6 * b + 2 * ax))
                    keyv = keyv | (((dq[ax] >> b) & 1) << (6 * b + 2 * ax + 1))
            return (dead << 30) | keyv

    elif key == "m6":
        # 6D Morton: position and direction bits interleaved, so a lane
        # block is compact in BOTH — a narrow beam, not an omnidirectional
        # shell around one origin cell.
        def _key(scene, state):
            dead = (state[12] <= 0.0).astype(jnp.int32)
            span = jnp.maximum(scene.grid.bbox_max - scene.grid.bbox_min,
                               1e-30)
            rel = (state[0:3] - scene.grid.bbox_min[:, None]) / span[:, None]
            q = jnp.clip(rel * 16.0, 0.0, 15.0).astype(jnp.int32)  # 4b/axis
            dq = jnp.clip((state[3:6] + 1.0) * 8.0, 0.0, 15.0).astype(
                jnp.int32
            )  # 4b/axis
            keyv = jnp.zeros_like(dead)
            for b in range(4):
                for ax in range(3):
                    keyv = keyv | (((q[ax] >> b) & 1) << (6 * b + 2 * ax))
                    keyv = keyv | (((dq[ax] >> b) & 1) << (6 * b + 2 * ax + 1))
            return (dead << 24) | keyv

    else:
        pos_bits, dir_bits = {"p4d4": (4, 4), "p5d3": (5, 3),
                              "p3d4": (3, 4)}[key]

        def _key(scene, state):
            dead = (state[12] <= 0.0).astype(jnp.int32)
            span = jnp.maximum(scene.grid.bbox_max - scene.grid.bbox_min,
                               1e-30)
            rel = (state[0:3] - scene.grid.bbox_min[:, None]) / span[:, None]
            q = jnp.clip(rel * (1 << pos_bits), 0.0,
                         (1 << pos_bits) - 1).astype(jnp.int32)
            morton = jnp.zeros_like(dead)
            for b in range(pos_bits):
                for ax in range(3):
                    morton = morton | (((q[ax] >> b) & 1) << (3 * b + ax))
            dq = jnp.clip(
                (state[3:6] + 1.0) * (1 << (dir_bits - 1)), 0.0,
                (1 << dir_bits) - 1,
            ).astype(jnp.int32)
            dcell = (dq[0] << (2 * dir_bits)) | (dq[1] << dir_bits) | dq[2]
            return (
                (dead << (3 * pos_bits + 3 * dir_bits))
                | (morton << (3 * dir_bits))
                | dcell
            )

    wf._ray_sort_key = _key

if tile is not None:
    import zig_raytracing_contest_tpu.scene.types as st

    _orig = mi.bake_triangles
    st.bake_triangles = lambda v0, e1, e2, **kw: _orig(v0, e1, e2, tile=tile)

from bench import build_large_scene  # noqa: E402
from zig_raytracing_contest_tpu.config import Config  # noqa: E402
from zig_raytracing_contest_tpu.render.pipeline import (  # noqa: E402
    prepare_scene,
    render_scene,
)


def main():
    huge = side > 500
    cfg = Config(grid_resolution=(128, 128, 128),
                 num_samples=1 if huge else 2,
                 max_bounce=2 if huge else 3, wave_size=wave)
    w, h = (640, 360) if huge else (1280, 720)
    with tempfile.TemporaryDirectory() as d:
        if "--sponza" in sys.argv:
            # Sponza-class multi-material interior (VERDICT r3 item 5):
            # 161k tris, 25 materials, 22 real textures — the streaming
            # trace + multi-material shade regime the terrain rows miss.
            sys.path.insert(0, str(Path(__file__).resolve().parent))
            from sponza_builder import write_sponza_glb

            p = write_sponza_glb(Path(d) / "s.glb", detail=1.25)
            scene, cam, _ = prepare_scene(str(p), cfg,
                                          camera_name="Camera 1", height=h)
        else:
            p = build_large_scene(Path(d) / "s.gltf", side=side)
            scene, cam, _ = prepare_scene(str(p), cfg,
                                          camera_name="Camera 1",
                                          width=w, height=h)
    print(f"wave={wave} tile={scene.mxu.tile} tiles={scene.mxu.tile_bbox.shape[1]} "
          f"tree={'off' if mi.TREE_MIN_TILES > 1 << 20 else 'on'}")
    render_scene(scene, cam, cfg)  # warm
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        _, stats = render_scene(scene, cam, cfg)
        wall = time.perf_counter() - t0
        r = stats.segments / wall / 1e6
        best = max(best, r)
        print(f"rep {r:.3f} Mrays/s")
    print(f"BEST: {best:.3f} Mrays/s")


if __name__ == "__main__":
    main()
