"""Host-side image decode/encode with stb-compatible semantics.

The reference decodes textures with ``stbi_loadf_from_memory(..., 4)``
(src/stage1.zig:58-64): every image becomes float RGBA where 8-bit color
channels are linearized as ``(x/255)^2.2`` (stb's ldr_to_hdr, gamma 2.2,
scale 1.0) and alpha stays linear ``a/255``; 16-bit sources are reduced to
8-bit first.  ``actual_c`` is the source channel count before forcing RGBA —
the alpha-texture path keys off it (src/stage1.zig:452).

PNG output mirrors ``stbi_write_png`` of packed 3-byte RGB rows
(src/main.zig:130-139).
"""

from __future__ import annotations

import io
from dataclasses import dataclass

import numpy as np
from PIL import Image

LDR_GAMMA = 2.2  # stb default stbi_ldr_to_hdr_gamma

_MODE_CHANNELS = {
    "1": 1,
    "L": 1,
    "I": 1,
    "I;16": 1,
    "F": 1,
    "LA": 2,
    "P": 3,  # overridden to 4 below when the palette carries transparency
    "RGB": 3,
    "RGBA": 4,
    "PA": 2,
}


@dataclass
class DecodedImage:
    """f32 RGBA pixels, gamma-linearized, plus the source channel count."""

    width: int
    height: int
    actual_c: int  # channels in the source file (1/2/3/4)
    pixels: np.ndarray  # (height * width, 4) float32, row-major from the top


def decode_image(data: bytes) -> DecodedImage:
    """Decode an encoded image (PNG/JPEG/...) to stb-loadf-style f32 RGBA."""
    img = Image.open(io.BytesIO(data))
    mode = img.mode
    actual_c = _MODE_CHANNELS.get(mode, 3)
    if mode == "P":
        has_alpha = "transparency" in img.info
        actual_c = 4 if has_alpha else 3
        img = img.convert("RGBA" if has_alpha else "RGB")
    if img.mode in ("I", "I;16", "F"):
        # 16/32-bit single channel: stb reduces to 8-bit before ldr_to_hdr.
        # PNG grayscale deeper than 8 bits is always 16-bit; Pillow opens it
        # as "I;16" (newer) or "I" (older), so both scale by 257 — keying on
        # the exact mode string saturated every >255 pixel to white on older
        # Pillow (ADVICE.md r1).  "F" (float sources) is left unscaled.
        arr = np.asarray(img, dtype=np.float32)
        scale = 1.0 if img.mode == "F" else 257.0
        img = Image.fromarray(
            np.clip(arr / scale, 0, 255).astype(np.uint8), mode="L"
        )
    if img.mode != "RGBA":
        img = img.convert("RGBA")
    u8 = np.asarray(img, dtype=np.float32) / 255.0  # (h, w, 4)
    out = np.empty_like(u8)
    out[..., :3] = u8[..., :3] ** LDR_GAMMA
    out[..., 3] = u8[..., 3]
    h, w = out.shape[:2]
    return DecodedImage(w, h, actual_c, out.reshape(h * w, 4).astype(np.float32))


def write_png(path: str, rgb: np.ndarray) -> None:
    """Write (h, w, 3) uint8 rows top-first, like stbi_write_png."""
    if rgb.dtype != np.uint8 or rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) uint8, got {rgb.shape} {rgb.dtype}")
    Image.fromarray(rgb, mode="RGB").save(path, format="PNG")


def encode_srgb_png_bytes(rgba_u8: np.ndarray) -> bytes:
    """Encode (h, w, c) uint8 to PNG bytes — used by procedural test scenes."""
    mode = {1: "L", 2: "LA", 3: "RGB", 4: "RGBA"}[rgba_u8.shape[2]]
    buf = io.BytesIO()
    Image.fromarray(rgba_u8.squeeze(-1) if mode == "L" else rgba_u8, mode=mode).save(
        buf, format="PNG"
    )
    return buf.getvalue()
