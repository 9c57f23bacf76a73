"""Device-side scene representation: flat SoA jnp arrays.

TPU analogue of the reference's baked Scene (src/stage3.zig:136-141): grid +
[begin, end) cell ranges + SoA triangles.  Hot-path position data
(Möller–Trumbore precomputed v0/e1/e2, src/linalg.zig:688-694) is duplicated
per overlapping cell in DDA-visit order exactly like bakeInto
(src/stage2.zig:137-164); shading attributes stay unique and are reached via
``dup_to_tri`` with one gather at shade time — the reference duplicates both,
but on TPU the extra HBM for cold attributes buys nothing.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..grid.builder import GridBuild
from ..ops.dda import GridParams
from .geometry import GeometryArrays
from .materials import MaterialBank


class DeviceScene(NamedTuple):
    grid: GridParams
    cell_begin: jnp.ndarray  # (C,) int32
    cell_end: jnp.ndarray  # (C,) int32
    # Hot intersection data — duplicated per cell reference, DDA order:
    tri_v0: jnp.ndarray  # (D, 3) f32
    tri_e1: jnp.ndarray  # (D, 3) f32
    tri_e2: jnp.ndarray  # (D, 3) f32
    dup_to_tri: jnp.ndarray  # (D,) int32
    # Unique shading attributes:
    normals: jnp.ndarray  # (T, 3, 3) f32
    texcoords: jnp.ndarray  # (T, 3, 2) f32
    material_idx: jnp.ndarray  # (T,) int32
    # Material/texture banks:
    mat_base: jnp.ndarray  # (M,) int32
    mat_emissive: jnp.ndarray  # (M,) int32
    mat_alpha: jnp.ndarray  # (M,) int32
    color_desc: jnp.ndarray  # (Nc, 7) int32
    color_data: jnp.ndarray  # (Pc, 3) f32
    alpha_desc: jnp.ndarray  # (Na, 7) int32
    alpha_data: jnp.ndarray  # (Pa,) f32


def build_device_scene(
    geometry: GeometryArrays, grid: GridBuild, materials: MaterialBank
) -> DeviceScene:
    dup = grid.dup_to_tri.astype(np.int64)
    p0 = geometry.positions[dup, 0]
    p1 = geometry.positions[dup, 1]
    p2 = geometry.positions[dup, 2]

    # Pad the duplicated arrays so D is never 0 and gathers stay in range;
    # padded entries are unreachable (cell ranges never point at them).
    def pad1(a):
        return np.concatenate([a, np.zeros((1,) + a.shape[1:], a.dtype)], axis=0)

    return DeviceScene(
        grid=GridParams(
            bbox_min=jnp.asarray(grid.bbox_min, jnp.float32),
            bbox_max=jnp.asarray(grid.bbox_max, jnp.float32),
            resolution=jnp.asarray(grid.resolution, jnp.int32),
            cell_size=jnp.asarray(grid.cell_size, jnp.float32),
        ),
        cell_begin=jnp.asarray(grid.cell_begin, jnp.int32),
        cell_end=jnp.asarray(grid.cell_end, jnp.int32),
        tri_v0=jnp.asarray(pad1(p0), jnp.float32),
        tri_e1=jnp.asarray(pad1(p1 - p0), jnp.float32),
        tri_e2=jnp.asarray(pad1(p2 - p0), jnp.float32),
        dup_to_tri=jnp.asarray(pad1(grid.dup_to_tri), jnp.int32),
        normals=jnp.asarray(geometry.normals, jnp.float32),
        texcoords=jnp.asarray(geometry.texcoords, jnp.float32),
        material_idx=jnp.asarray(geometry.material_idx, jnp.int32),
        mat_base=jnp.asarray(materials.mat_base, jnp.int32),
        mat_emissive=jnp.asarray(materials.mat_emissive, jnp.int32),
        mat_alpha=jnp.asarray(materials.mat_alpha, jnp.int32),
        color_desc=jnp.asarray(materials.color_desc, jnp.int32),
        color_data=jnp.asarray(materials.color_data, jnp.float32),
        alpha_desc=jnp.asarray(materials.alpha_desc, jnp.int32),
        alpha_data=jnp.asarray(materials.alpha_data, jnp.float32),
    )
