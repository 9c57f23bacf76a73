"""Material/texture baking into TPU-friendly flat texture banks.

Mirrors stage1.loadMaterials (src/stage1.zig:381-496): per material, three
textures — base_color (RGB × baseColorFactor), emissive (RGB × emissiveFactor)
and "transparency" (actually opacity: the base-color alpha channel for
non-opaque materials whose source image really has alpha, thresholded by
alphaCutoff in MASK mode).  Absent textures become 1×1 dummies holding the
factor (src/stage1.zig:411-425).  Sampler clamp_to_edge sets per-axis clamp
ranges; anything else is repeat encoded as the full int32 range
(src/stage1.zig:381-409).

TPU re-design: instead of per-texture pointers, all color texels concatenate
into one flat (P, 3) array and all alpha texels into one flat (P,) array,
with per-texture descriptor rows [offset, w, h, u_min, u_max, v_min, v_max]
(int32).  A shading wave gathers descriptor rows by material id, then texels
by computed flat indices — two vectorized gathers, no host round trips.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .gltf import WRAP_CLAMP_TO_EDGE, Gltf

INT32_MIN = -(2**31)
INT32_MAX = 2**31 - 1

# Descriptor column layout (int32):
DESC_OFFSET = 0
DESC_W = 1
DESC_H = 2
DESC_U_MIN = 3
DESC_U_MAX = 4
DESC_V_MIN = 5
DESC_V_MAX = 6
DESC_COLS = 7


@dataclass
class MaterialBank:
    color_data: np.ndarray  # (Pc, 3) f32 — all color texels
    color_desc: np.ndarray  # (Nc, 7) int32
    alpha_data: np.ndarray  # (Pa,) f32 — all opacity texels
    alpha_desc: np.ndarray  # (Na, 7) int32
    mat_base: np.ndarray  # (M,) int32 → color_desc row
    mat_emissive: np.ndarray  # (M,) int32 → color_desc row
    mat_alpha: np.ndarray  # (M,) int32 → alpha_desc row

    @property
    def num_materials(self) -> int:
        return self.mat_base.shape[0]


def _wrap_ranges(gltf: Gltf, texture: dict, w: int, h: int) -> tuple[int, int, int, int]:
    u_min, u_max = INT32_MIN, INT32_MAX
    v_min, v_max = INT32_MIN, INT32_MAX
    if "sampler" in texture:
        sampler = gltf.doc["samplers"][texture["sampler"]]
        if sampler.get("wrapS") == WRAP_CLAMP_TO_EDGE:
            u_min, u_max = 0, w - 1
        if sampler.get("wrapT") == WRAP_CLAMP_TO_EDGE:
            v_min, v_max = 0, h - 1
    return u_min, u_max, v_min, v_max


class _Bank:
    """Accumulates texel blobs + descriptors with dedup by cache key."""

    def __init__(self, channels: int):
        self.channels = channels
        self.blobs: list[np.ndarray] = []
        self.descs: list[list[int]] = []
        self.offset = 0
        self.cache: dict = {}

    def add(self, key, texels: np.ndarray, w: int, h: int, wrap) -> int:
        if key in self.cache:
            return self.cache[key]
        idx = len(self.descs)
        self.blobs.append(texels.reshape(-1, self.channels).astype(np.float32))
        self.descs.append([self.offset, w, h, *wrap])
        self.offset += w * h
        self.cache[key] = idx
        return idx

    def finish(self) -> tuple[np.ndarray, np.ndarray]:
        if not self.blobs:
            # Degenerate but valid: one white dummy so gathers stay in range.
            self.blobs.append(np.ones((1, self.channels), np.float32))
            self.descs.append([0, 1, 1, 0, 0, 0, 0])
        data = np.concatenate(self.blobs, axis=0)
        if self.channels == 1:
            data = data.reshape(-1)
        return data, np.asarray(self.descs, np.int32)


def _color_texture(bank: _Bank, gltf: Gltf, texture_info, factor) -> int:
    """src/stage1.zig:427-445 — RGB texels × factor, or 1×1 dummy factor."""
    factor = np.asarray(factor[:3], np.float32)
    if texture_info is not None:
        tex_idx = texture_info["index"]
        texture = gltf.doc["textures"][tex_idx]
        image = gltf.images[texture["source"]]
        key = ("tex", tex_idx, tuple(np.round(factor, 7)))
        if key in bank.cache:
            return bank.cache[key]
        texels = image.pixels[:, :3] * factor
        wrap = _wrap_ranges(gltf, texture, image.width, image.height)
        return bank.add(key, texels, image.width, image.height, wrap)
    key = ("dummy", tuple(np.round(factor, 7)))
    return bank.add(key, factor.reshape(1, 3), 1, 1, (0, 0, 0, 0))


def _alpha_texture(bank: _Bank, gltf: Gltf, material: dict) -> int:
    """src/stage1.zig:447-469 — opacity from base-color alpha, else dummy 1."""
    alpha_mode = material.get("alphaMode", "OPAQUE")
    pbr = material.get("pbrMetallicRoughness", {})
    info = pbr.get("baseColorTexture")
    if alpha_mode != "OPAQUE" and info is not None:
        tex_idx = info["index"]
        texture = gltf.doc["textures"][tex_idx]
        image = gltf.images[texture["source"]]
        if image.actual_c in (4, 2):
            cutoff = np.float32(material.get("alphaCutoff", 0.5))
            key = ("tex", tex_idx, alpha_mode, float(cutoff) if alpha_mode == "MASK" else None)
            if key in bank.cache:
                return bank.cache[key]
            alpha = image.pixels[:, 3]
            if alpha_mode == "MASK":
                alpha = (alpha > cutoff).astype(np.float32)
            wrap = _wrap_ranges(gltf, texture, image.width, image.height)
            return bank.add(key, alpha, image.width, image.height, wrap)
    return bank.add(("dummy", 1.0), np.asarray([1.0], np.float32), 1, 1, (0, 0, 0, 0))


def load_materials(gltf: Gltf) -> MaterialBank:
    colors = _Bank(3)
    alphas = _Bank(1)
    mat_base: list[int] = []
    mat_emissive: list[int] = []
    mat_alpha: list[int] = []

    for material in gltf.doc.get("materials", []):
        pbr = material.get("pbrMetallicRoughness", {})
        mat_base.append(
            _color_texture(
                colors,
                gltf,
                pbr.get("baseColorTexture"),
                pbr.get("baseColorFactor", [1.0, 1.0, 1.0, 1.0]),
            )
        )
        mat_emissive.append(
            _color_texture(
                colors,
                gltf,
                material.get("emissiveTexture"),
                material.get("emissiveFactor", [0.0, 0.0, 0.0]),
            )
        )
        mat_alpha.append(_alpha_texture(alphas, gltf, material))

    color_data, color_desc = colors.finish()
    alpha_data, alpha_desc = alphas.finish()
    return MaterialBank(
        color_data=color_data,
        color_desc=color_desc,
        alpha_data=alpha_data,
        alpha_desc=alpha_desc,
        mat_base=np.asarray(mat_base or [0], np.int32),
        mat_emissive=np.asarray(mat_emissive or [0], np.int32),
        mat_alpha=np.asarray(mat_alpha or [0], np.int32),
    )
