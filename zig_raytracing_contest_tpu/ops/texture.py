"""Batched bilinear texture sampling from flat texture banks.

Reference semantics (src/stage3.zig:82-123) reproduced exactly, including its
quirks, per SURVEY.md §7 hard-part (b):

* texel coords: ``floor(w * u)`` / ``floor(h * v)`` as int32;
* clamp to per-texture [u_min, u_max] (full int32 range means repeat), then
  floored-mod by the texture size (``@mod`` in Zig == ``jnp.mod`` for a
  positive divisor);
* bilinear weights are ``frac(u) = |u - trunc(u)|`` of the RAW uv coordinate
  (src/stage3.zig:94-96,118-120) — NOT of the scaled texel coordinate.  This
  is the reference's defining quirk and golden renders depend on it.

Each ray supplies a descriptor row [offset, w, h, u_min, u_max, v_min, v_max]
gathered from the material table; sampling is two gathers + VPU math.
"""

from __future__ import annotations

import jax.numpy as jnp

_I32_SAFE_LO = -(2**31) + 2
_I32_SAFE_HI = 2**31 - 2


def _frac(v):
    return jnp.abs(v - jnp.trunc(v))


def _texel_index(coord_f, lo, hi, size):
    """floor→int32, clamp to descriptor range, floored mod size."""
    # Clamp in float first so the int cast can't overflow (the reference's
    # @intFromFloat would be UB there).
    coord_f = jnp.clip(coord_f, float(_I32_SAFE_LO), float(_I32_SAFE_HI))
    ci = coord_f.astype(jnp.int32)
    ci = jnp.clip(ci, lo, hi)
    return jnp.mod(ci, size)


def sample_texture(data, desc_rows, u, v):
    """Sample a bank of textures bilinearly.

    data: (P, C) f32 or (P,) f32 flat texel bank.
    desc_rows: (R, 7) descriptor per ray — int32, or f32-encoded (the fat
    shade_table stores them as floats; values are exact up to 2^24 and the
    repeat sentinels are ±2^30).
    u, v: (R,) f32 texture coordinates.
    Returns (R, C) or (R,) sampled values.
    """
    desc_i = desc_rows.astype(jnp.int32)
    offset = desc_i[:, 0]
    w = desc_i[:, 1]
    h = desc_i[:, 2]
    u_min, u_max = desc_i[:, 3], desc_i[:, 4]
    v_min, v_max = desc_i[:, 5], desc_i[:, 6]

    wf = w.astype(jnp.float32)
    hf = h.astype(jnp.float32)

    ui = jnp.floor(wf * u)
    vi = jnp.floor(hf * v)

    x1 = _texel_index(ui, u_min, u_max, w)
    y1 = _texel_index(vi, v_min, v_max, h)
    x2 = _texel_index(ui + 1.0, u_min, u_max, w)
    y2 = _texel_index(vi + 1.0, v_min, v_max, h)

    def pixel(x, y):
        return data[offset + y * w + x]

    fu = _frac(u)
    fv = _frac(v)
    if data.ndim == 2:
        fu = fu[:, None]
        fv = fv[:, None]
    r1 = pixel(x1, y1) * (1.0 - fu) + pixel(x2, y1) * fu
    r2 = pixel(x1, y2) * (1.0 - fu) + pixel(x2, y2) * fu
    return r1 * (1.0 - fv) + r2 * fv
