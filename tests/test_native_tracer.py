"""Native C++ CPU tracer vs the jax renderer: independent-oracle equality.

The C++ tracer re-implements the full reference pipeline (grid DDA, MT,
textures, alpha, diffuse GI) sharing ONLY the baked scene arrays and the
counter-RNG definition with the jax path — any systematic bug in the
wavefront re-architecture (bounce accounting, mask logic, texture quirks)
would show up as a divergence here.
"""

import shutil

import numpy as np
import pytest

from zig_raytracing_contest_tpu.config import Config
from zig_raytracing_contest_tpu.grid.builder import build_grid
from zig_raytracing_contest_tpu.render.pipeline import render_scene
from zig_raytracing_contest_tpu.scene import procedural
from zig_raytracing_contest_tpu.scene.camera import load_camera
from zig_raytracing_contest_tpu.scene.geometry import load_geometry
from zig_raytracing_contest_tpu.scene.gltf import load_gltf
from zig_raytracing_contest_tpu.scene.materials import load_materials
from zig_raytracing_contest_tpu.scene.types import build_device_scene

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="no C++ toolchain"
)


@pytest.fixture(scope="module")
def textured_box(tmp_path_factory):
    d = tmp_path_factory.mktemp("scenes")
    # Cornell box + textured/alpha quads: exercises every shading path.
    b = procedural.SceneBuilder()
    white = b.add_material(base_color_factor=(0.73, 0.73, 0.73, 1))
    red = b.add_material(base_color_factor=(0.65, 0.05, 0.05, 1))
    light = b.add_material(base_color_factor=(0, 0, 0, 1), emissive_factor=(5, 5, 5))
    checker = np.zeros((4, 4, 4), np.uint8)
    checker[::2, ::2] = checker[1::2, 1::2] = [220, 220, 220, 255]
    checker[::2, 1::2] = checker[1::2, ::2] = [40, 40, 40, 255]
    tex = b.add_material(
        base_color_texture=b.add_texture(b.add_image_png(checker))
    )
    holes = np.full((1, 1, 4), 255, np.uint8)
    holes[0, 0, 3] = 120
    glass = b.add_material(
        base_color_texture=b.add_texture(b.add_image_png(holes)),
        alpha_mode="BLEND",
    )
    s = 1.0
    walls = [
        ((0, -s, 0), (s, 0, 0), (0, 0, -s), tex),
        ((0, s, 0), (s, 0, 0), (0, 0, s), light),
        ((0, 0, -s), (s, 0, 0), (0, s, 0), white),
        ((-s, 0, 0), (0, 0, s), (0, s, 0), red),
        ((0, 0, 0.3), (0.5, 0, 0), (0, 0.5, 0), glass),
    ]
    for center, uax, vax, mat in walls:
        p, i, n, t = procedural.quad(center, uax, vax)
        b.add_mesh_node(p, i, mat, normals=n, texcoords=t * 2)
    b.add_camera_node((0, 0, 3.2), (0, 0, 0), yfov=0.9, name="c")
    gltf = load_gltf(b.write_gltf(d / "t.gltf"))
    cam = load_camera(gltf, width=48, height=48)
    geo = load_geometry(gltf)
    mats = load_materials(gltf)
    grid = build_grid(geo.positions, (8, 8, 8))
    return cam, build_device_scene(geo, grid, mats, backend="grid")


def test_native_tracer_matches_jax_render(textured_box):
    from zig_raytracing_contest_tpu.render.native_cpu import render_cpu

    cam, scene = textured_box
    cfg = Config(num_samples=4, max_bounce=4, seed=11)
    img_jax, stats = render_scene(scene, cam, cfg)
    img_cpp, segments, _ = render_cpu(scene, cam, spp=4, max_bounce=4, seed=11)

    # Same RNG streams, same hit rule, same texture math → images agree
    # except for float-reassociation / libm-ULP pixels.  Segment counts can
    # drift by the few seam rays whose hit/miss flips at ULP level (a flipped
    # miss ends a path early).
    assert abs(segments - stats.segments) <= max(8, stats.segments // 1000)
    diff = np.abs(img_jax.astype(int) - img_cpp.astype(int))
    assert (diff > 2).mean() < 0.02, f"{(diff > 2).mean():.2%} pixels diverge"
    assert diff.mean() < 1.0


def test_native_tracer_thread_count_invariant(textured_box):
    """Counter RNG ⇒ output independent of thread count (unlike the
    reference, whose image depends on it — src/stage3.zig:225)."""
    from zig_raytracing_contest_tpu.render.native_cpu import render_cpu

    cam, scene = textured_box
    a, sa, _ = render_cpu(scene, cam, spp=2, max_bounce=3, seed=3, num_threads=1)
    b, sb, _ = render_cpu(scene, cam, spp=2, max_bounce=3, seed=3, num_threads=8)
    np.testing.assert_array_equal(a, b)
    assert sa == sb
