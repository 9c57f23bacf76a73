"""Golden-image regression on externally-authored-style glTF assets.

The assets under tests/assets/ are raw-JSON glTF files with hand-packed
binary buffers (see make_assets.py) — produced WITHOUT scene/procedural.py,
so a loader bug mirrored into SceneBuilder cannot hide here.  They cover the
reference author's manual test list (Duck-class textured mesh; the
AlphaBlendModeTest categories OPAQUE/MASK/BLEND with clamp sampling)
(/root/reference/zig_raytracing_contest.sublime-project build_systems).

Renders are deterministic per seed on the CPU backend; the tolerance only
absorbs float-reassociation across jax/XLA versions.
"""

from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from zig_raytracing_contest_tpu.config import Config
from zig_raytracing_contest_tpu.render.pipeline import prepare_scene, render_scene

ASSETS = Path(__file__).parent / "assets"

CASES = {
    "duckish": dict(height=96),  # aspectRatio camera: width derived
    "alpha_modes": dict(width=128, height=96),
}


def _render(name):
    cfg = Config(grid_resolution=(16, 16, 16), num_samples=4, max_bounce=3, seed=12345)
    scene, cam, _ = prepare_scene(str(ASSETS / f"{name}.gltf"), cfg, **CASES[name])
    img, _ = render_scene(scene, cam, cfg)
    return img


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden(name):
    golden = np.asarray(Image.open(ASSETS / f"golden_{name}.png"))
    img = _render(name)
    assert img.shape == golden.shape
    diff = np.abs(img.astype(int) - golden.astype(int))
    # Bit-identical on the pinned backend; tolerate ULP-flip pixels only.
    assert (diff > 3).mean() < 0.005, f"{name}: {(diff > 3).mean():.4%} pixels off"
    assert diff.mean() < 1.0, f"{name}: mean |diff| {diff.mean():.3f}"


def test_duckish_loader_details():
    """The raw asset exercises loader paths procedural scenes don't:
    data-URI buffer, shared-vertex indexed mesh, aspectRatio camera."""
    from zig_raytracing_contest_tpu.scene.camera import load_camera
    from zig_raytracing_contest_tpu.scene.geometry import load_geometry
    from zig_raytracing_contest_tpu.scene.gltf import load_gltf

    gltf = load_gltf(str(ASSETS / "duckish.gltf"))
    cam = load_camera(gltf, height=96)
    assert cam.width == 144  # 96 * aspectRatio 1.5
    geo = load_geometry(gltf)
    assert geo.num_triangles == 6 * 6 * 2 + 2
