"""Bilinear texture sampling semantics (reference src/stage3.zig:82-123)."""

import jax.numpy as jnp
import numpy as np

from zig_raytracing_contest_tpu.ops.texture import sample_texture
from zig_raytracing_contest_tpu.scene.materials import INT32_MAX, INT32_MIN


def desc(offset, w, h, u_min=INT32_MIN, u_max=INT32_MAX, v_min=INT32_MIN, v_max=INT32_MAX):
    return jnp.asarray([[offset, w, h, u_min, u_max, v_min, v_max]], jnp.int32)


def sample1(data, d, u, v):
    out = sample_texture(
        jnp.asarray(data, jnp.float32),
        d,
        jnp.asarray([u], jnp.float32),
        jnp.asarray([v], jnp.float32),
    )
    return np.asarray(out)[0]


def test_dummy_1x1_always_returns_pixel():
    data = np.asarray([[0.25, 0.5, 0.75]], np.float32)
    d = desc(0, 1, 1, 0, 0, 0, 0)
    for u, v in [(0.0, 0.0), (0.5, 0.7), (-3.2, 12.0)]:
        np.testing.assert_allclose(sample1(data, d, u, v), [0.25, 0.5, 0.75], atol=1e-6)


def test_frac_of_raw_uv_is_the_bilinear_weight():
    # 2x1 texture [a, b]; reference weight is frac(u) of the RAW uv — at
    # u = 0.75 (texel coord 1.5) the weight is 0.75, not 0.5.
    data = np.asarray([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]], np.float32)
    d = desc(0, 2, 1, 0, 1, 0, 0)  # clamp both axes
    out = sample1(data, d, 0.75, 0.0)
    # ui = floor(2*0.75) = 1 → x1 = 1, x2 = clamp(2,0,1) = 1 → both texels b;
    # weight irrelevant here: result is b.
    np.testing.assert_allclose(out, [1, 1, 1], atol=1e-6)
    out = sample1(data, d, 0.25, 0.0)
    # ui = 0 → x1=0, x2=1, weight = frac(0.25) = 0.25 ⇒ 0.25*b
    np.testing.assert_allclose(out, [0.25] * 3, atol=1e-6)


def test_repeat_wraps_negative_coords():
    data = np.asarray([[0.0, 0, 0], [1.0, 1, 1]], np.float32)
    d = desc(0, 2, 1)  # full repeat
    # u = -0.25: ui = floor(2*-0.25) = -1 → mod 2 = 1 → x1 = b, x2 = 0
    # weight = frac(-0.25) = 0.25 ⇒ 0.75*b + 0.25*a
    out = sample1(data, d, -0.25, 0.0)
    np.testing.assert_allclose(out, [0.75] * 3, atol=1e-6)


def test_clamp_to_edge_blocks_wrap():
    data = np.asarray([[0.0, 0, 0], [1.0, 1, 1]], np.float32)
    d = desc(0, 2, 1, u_min=0, u_max=1, v_min=0, v_max=0)
    # u slightly over 1: ui = 2 clamps to 1 → both texels b
    np.testing.assert_allclose(sample1(data, d, 1.01, 0.0), [1, 1, 1], atol=1e-5)


def test_scalar_bank_alpha():
    data = np.asarray([0.0, 1.0], np.float32)
    d = desc(0, 2, 1, 0, 1, 0, 0)
    out = sample1(data, d, 0.25, 0.0)
    np.testing.assert_allclose(out, 0.25, atol=1e-6)


def test_v_axis_and_row_major_layout():
    # 1x2 texture (w=1, h=2): texel (x=0, y=1) at flat offset 1.
    data = np.asarray([[0.0, 0, 0], [1.0, 1, 1]], np.float32)
    d = desc(0, 1, 2, 0, 0, 0, 1)
    # v = 0.75 → vi = floor(2*0.75) = 1 → y1 = 1, y2 = clamp(2) = 1 ⇒ row 1
    np.testing.assert_allclose(sample1(data, d, 0.0, 0.75), [1, 1, 1], atol=1e-6)
