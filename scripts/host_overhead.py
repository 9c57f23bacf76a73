"""Break down render_scene wall-clock vs pure device time on the chip.

Times: (a) full render_scene, (b) the chunk call alone (block_until_ready),
(c) fb alloc, (d) the rgb epilogue (slice + /spp + vec3_to_rgb), (e) the
host transfer, (f) the segments sync.  Run: python scripts/host_overhead.py
"""

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_bench_scene
from zig_raytracing_contest_tpu.config import Config
from zig_raytracing_contest_tpu.ops import linalg
from zig_raytracing_contest_tpu.render.pipeline import prepare_scene, render_scene
from zig_raytracing_contest_tpu.render.wavefront import render_frame_chunk


def t(label, fn, n=3):
    fn()
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:38s} {best*1e3:9.1f} ms")
    return best


def main():
    cfg = Config(grid_resolution=(128, 128, 128), num_samples=3, max_bounce=4,
                 wave_size=1 << 19)
    with tempfile.TemporaryDirectory() as d:
        p = build_bench_scene(Path(d) / "s.gltf")
        scene, cam, _ = prepare_scene(str(p), cfg, camera_name="Camera 1",
                                      width=1920, height=1080)

    render_scene(scene, cam, cfg)  # warm everything

    t("full render_scene", lambda: render_scene(scene, cam, cfg))

    w, h, spp = cam.width, cam.height, cfg.num_samples
    num_pixels = w * h
    total_rays = num_pixels * spp
    quantum = spp * 1024
    wave_size = max(quantum, min(cfg.wave_size, total_rays + quantum - 1)
                    // quantum * quantum)
    wave_size = min(wave_size, (1 << 23) // quantum * quantum)
    num_waves = -(-total_rays // wave_size)
    wave_pixels = wave_size // spp
    fb_rows = num_waves * wave_pixels

    cam_origin = jnp.asarray(cam.origin)
    cam_llc = jnp.asarray(cam.lower_left_corner)
    cam_right = jnp.asarray(cam.right)
    cam_up = jnp.asarray(cam.up)
    key = jnp.uint32(cfg.seed)

    def alloc():
        jax.block_until_ready(jnp.zeros((fb_rows, 3), jnp.float32))

    t("fb alloc", alloc)

    def chunk():
        fb = jnp.zeros((fb_rows, 3), jnp.float32)
        fb, segs = render_frame_chunk(
            scene, fb, cam_origin, cam_llc, cam_right, cam_up,
            w, spp, cfg.max_bounce, wave_size, num_pixels, num_waves,
            jnp.int32(0), key, None, None)
        jax.block_until_ready((fb, segs))
        return fb, segs

    fb, segs = chunk()
    t("chunk call (device render)", lambda: jax.block_until_ready(chunk()))

    fb2 = fb + 0  # non-donated copy for reuse

    def epilogue():
        img = np.asarray(linalg.vec3_to_rgb(fb2[:num_pixels] / spp))
        return img

    t("epilogue (rgb + transfer)", epilogue)

    def rgb_only():
        jax.block_until_ready(linalg.vec3_to_rgb(fb2[:num_pixels] / spp))

    t("rgb device-only", rgb_only)

    def seg_sync():
        return int(segs)

    t("segments int() sync", seg_sync)


if __name__ == "__main__":
    main()
