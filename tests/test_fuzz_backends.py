"""Property test: on randomized scenes, the two intersection backends and
the native C++ tracer agree.

Each trial builds a random quad-soup scene (random transforms, materials,
alpha modes, textures) and checks MXU-vs-grid trace visibility plus
C++-vs-jax render agreement.  Catches regressions the hand-built scenes
miss (degenerate transforms, grazing-angle tiles, odd material mixes).
"""

import shutil

import jax.numpy as jnp
import numpy as np
import pytest

from zig_raytracing_contest_tpu.config import Config
from zig_raytracing_contest_tpu.grid.builder import build_grid
from zig_raytracing_contest_tpu.render.pipeline import render_scene
from zig_raytracing_contest_tpu.render.wavefront import trace_any
from zig_raytracing_contest_tpu.scene import procedural
from zig_raytracing_contest_tpu.scene.camera import load_camera
from zig_raytracing_contest_tpu.scene.geometry import load_geometry
from zig_raytracing_contest_tpu.scene.gltf import load_gltf
from zig_raytracing_contest_tpu.scene.materials import load_materials
from zig_raytracing_contest_tpu.scene.types import build_device_scene

pytestmark = pytest.mark.slow  # 4-seed MXU-vs-grid-vs-C++ property fuzz (interpret mode)


def _random_scene(tmp_path, seed):
    rng = np.random.default_rng(seed)
    b = procedural.SceneBuilder()
    tex_img = rng.integers(0, 256, (4, 4, 4), dtype=np.uint8)
    tex = b.add_texture(b.add_image_png(np.ascontiguousarray(tex_img)))
    mats = [
        b.add_material(base_color_factor=rng.uniform(0.1, 1, 3).tolist() + [1]),
        b.add_material(base_color_texture=tex, alpha_mode="BLEND"),
        b.add_material(base_color_factor=(0, 0, 0, 1),
                       emissive_factor=rng.uniform(0, 4, 3).tolist()),
    ]
    for k in range(rng.integers(5, 20)):
        c = rng.uniform(-3, 3, 3)
        u = rng.standard_normal(3) * rng.uniform(0.1, 1.5)
        v = rng.standard_normal(3) * rng.uniform(0.1, 1.5)
        p, i, n, t = procedural.quad(c, u, v)
        b.add_mesh_node(p, i, mats[k % 3], normals=n, texcoords=t * 2)
    b.add_camera_node((0, 0, 8), (0, 0, 0), yfov=0.9, name="c")
    gltf = load_gltf(b.write_gltf(tmp_path / f"f{seed}.gltf"))
    cam = load_camera(gltf, width=24, height=24)
    geo = load_geometry(gltf)
    materials = load_materials(gltf)
    grid = build_grid(geo.positions, (8, 8, 8))
    return cam, geo, materials, grid


@pytest.mark.parametrize("seed", [101, 202, 303, 404])
def test_random_scene_backend_agreement(tmp_path, seed):
    cam, geo, materials, grid = _random_scene(tmp_path, seed)
    scene_g = build_device_scene(geo, grid, materials, backend="grid")
    scene_m = build_device_scene(geo, grid, materials, backend="mxu")

    xs, ys = np.meshgrid(np.arange(24) + 0.37, np.arange(24) + 0.61)
    dirs = (
        cam.lower_left_corner
        + cam.right * xs.reshape(-1, 1).astype(np.float32)
        + cam.up * ys.reshape(-1, 1).astype(np.float32)
    )
    dirs = (dirs / np.linalg.norm(dirs, axis=1, keepdims=True)).astype(np.float32)
    orig = np.tile(cam.origin, (len(dirs), 1)).astype(np.float32)
    act = jnp.ones(len(dirs), bool)

    tg, _, _, ig = (np.asarray(x) for x in trace_any(scene_g, jnp.asarray(orig), jnp.asarray(dirs), act))
    tm, _, _, im = (np.asarray(x) for x in trace_any(scene_m, jnp.asarray(orig), jnp.asarray(dirs), act))
    both = np.isfinite(tg) & np.isfinite(tm)
    assert (np.isfinite(tg) != np.isfinite(tm)).mean() < 0.02
    agree = (ig[both] == im[both]) | (np.abs(tg[both] - tm[both]) < 1e-3)
    assert agree.mean() > 0.98  # coplanar-overlap ties excepted

    if shutil.which("g++"):
        from zig_raytracing_contest_tpu.render.native_cpu import render_cpu

        img_j, _ = render_scene(scene_g, cam, Config(num_samples=2, max_bounce=3, seed=seed))
        img_c, _, _ = render_cpu(scene_g, cam, spp=2, max_bounce=3, seed=seed)
        diff = np.abs(img_j.astype(int) - img_c.astype(int))
        assert (diff > 2).mean() < 0.05, f"seed {seed}: {(diff > 2).mean():.2%}"
