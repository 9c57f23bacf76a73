"""Fused Pallas pipeline (interpret mode) vs the XLA shading path.

trace_emit_aux + shade_fused must produce the same radiance/throughput/ray
updates as trace_any + wavefront.shade_and_scatter + the caller's mask
arithmetic — same RNG streams, same texture semantics, same masks — up to
f32 reassociation in the sky/emissive blends.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zig_raytracing_contest_tpu.grid.builder import build_grid
from zig_raytracing_contest_tpu.ops import linalg, rng
from zig_raytracing_contest_tpu.ops.mxu_intersect import trace_emit_aux
from zig_raytracing_contest_tpu.render.fused import shade_fused
from zig_raytracing_contest_tpu.render.wavefront import (
    shade_and_scatter,
    trace_any,
)
from zig_raytracing_contest_tpu.scene import procedural
from zig_raytracing_contest_tpu.scene.camera import load_camera
from zig_raytracing_contest_tpu.scene.geometry import load_geometry
from zig_raytracing_contest_tpu.scene.gltf import load_gltf
from zig_raytracing_contest_tpu.scene.materials import load_materials
from zig_raytracing_contest_tpu.scene.types import build_device_scene

pytestmark = pytest.mark.slow  # interpret-mode Pallas kernel equality (minutes)

R = 1024


@pytest.fixture(scope="module")
def scene_and_rays(tmp_path_factory):
    d = tmp_path_factory.mktemp("scenes")
    # Cornell box + a transparent quad so the alpha path is exercised.
    b = procedural.SceneBuilder()
    white = b.add_material(base_color_factor=(0.7, 0.7, 0.7, 1))
    light = b.add_material(base_color_factor=(0, 0, 0, 1), emissive_factor=(4, 4, 4))
    img_t = b.add_image_png(np.asarray([[[255, 255, 255, 100]]], np.uint8))
    glass = b.add_material(
        base_color_texture=b.add_texture(img_t), alpha_mode="BLEND"
    )
    s = 1.0
    for center, uax, vax, mat in [
        ((0, -s, 0), (s, 0, 0), (0, 0, -s), white),
        ((0, s, 0), (s, 0, 0), (0, 0, s), light),
        ((0, 0, -s), (s, 0, 0), (0, s, 0), white),
        ((0, 0, 0.2), (0.6, 0, 0), (0, 0.6, 0), glass),
    ]:
        p, i, n, t = procedural.quad(center, uax, vax)
        b.add_mesh_node(p, i, mat, normals=n, texcoords=t)
    b.add_camera_node((0, 0, 3), (0, 0, 0), yfov=0.8, name="c")
    gltf = load_gltf(b.write_gltf(d / "f.gltf"))
    cam = load_camera(gltf, width=32, height=32)
    geo = load_geometry(gltf)
    scene = build_device_scene(
        geo, build_grid(geo.positions, (4, 4, 4)), load_materials(gltf), backend="mxu"
    )

    xs = (np.arange(R) % 32 + 0.37).astype(np.float32)
    ys = (np.arange(R) // 32 + 0.61).astype(np.float32)
    dirs = (
        cam.lower_left_corner
        + cam.right * xs[:, None]
        + cam.up * ys[:, None]
    )
    dirs = (dirs / np.linalg.norm(dirs, axis=1, keepdims=True)).astype(np.float32)
    orig = np.tile(cam.origin, (R, 1)).astype(np.float32)
    return scene, jnp.asarray(orig), jnp.asarray(dirs)


def make_state16(orig, direction, throughput, radiance, alive, streams):
    return jnp.concatenate(
        [
            orig.T,
            direction.T,
            throughput.T,
            radiance.T,
            alive.astype(jnp.float32)[None],
            jax.lax.bitcast_convert_type(streams, jnp.float32)[None],
            jnp.zeros((2, orig.shape[0]), jnp.float32),
        ],
        axis=0,
    )


def test_trace_emit_aux_matches_trace_any(scene_and_rays):
    scene, orig, direction = scene_and_rays
    streams = rng.ray_streams(jnp.uint32(7), jnp.arange(R, dtype=jnp.int32))
    alive = jnp.ones(R, bool)
    state = make_state16(
        orig, direction, jnp.ones((R, 3)), jnp.zeros((R, 3)), alive, streams
    )
    aux, idx_m, _ = trace_emit_aux(scene.mxu, state, interpret=True)
    t, u, v, tri = trace_any(scene, orig, direction, alive)

    np.testing.assert_allclose(np.asarray(aux[2]), np.asarray(t), atol=1e-5)
    hit = np.isfinite(np.asarray(t))
    # idx_m is Morton-space; map through perm to compare with unique ids
    tri_f = np.asarray(scene.mxu.perm)[np.asarray(idx_m)]
    np.testing.assert_array_equal(tri_f[hit], np.asarray(tri)[hit])
    np.testing.assert_allclose(np.asarray(aux[0])[hit], np.asarray(u)[hit], atol=1e-5)
    np.testing.assert_allclose(np.asarray(aux[1])[hit], np.asarray(v)[hit], atol=1e-5)
    # streams/alive pass-through rows
    np.testing.assert_array_equal(
        np.asarray(jax.lax.bitcast_convert_type(aux[3], jnp.uint32)),
        np.asarray(streams),
    )
    np.testing.assert_array_equal(np.asarray(aux[4] > 0), np.asarray(alive))


def test_fused_matches_xla_shading(scene_and_rays):
    scene, orig, direction = scene_and_rays
    streams = rng.ray_streams(jnp.uint32(7), jnp.arange(R, dtype=jnp.int32))
    alive = jnp.ones(R, bool)
    throughput = jnp.full((R, 3), 0.8, jnp.float32)
    radiance = jnp.full((R, 3), 0.05, jnp.float32)

    t, u, v, tri = trace_any(scene, orig, direction, alive)
    assert int(jnp.isfinite(t).sum()) > R // 2  # scene actually hit

    # --- XLA reference composition (mirrors render_wave's loop body)
    bounce = 1
    new_orig, new_dir, emissive, albedo, pass_through, missed, _ = shade_and_scatter(
        scene, orig, direction, t, u, v, tri, streams, bounce
    )
    add_env = alive & missed
    rad_x = radiance + jnp.where(
        add_env[:, None], throughput * linalg.env_color(direction), 0.0
    )
    shaded = alive & ~missed & ~pass_through
    rad_x = rad_x + jnp.where(shaded[:, None], throughput * emissive, 0.0)
    tput_x = jnp.where(shaded[:, None], throughput * albedo, throughput)
    stepped = alive & ~missed
    orig_x = jnp.where(stepped[:, None], new_orig, orig)
    dir_x = jnp.where(stepped[:, None], new_dir, direction)

    # --- fused path (interpret mode on CPU); trace kernel supplies aux
    # and Morton-space ids, which must agree with the XLA trace results.
    state = make_state16(orig, direction, throughput, radiance, alive, streams)
    aux, idx_m, _ = trace_emit_aux(scene.mxu, state, interpret=True)
    new_state = jax.jit(
        lambda s, a: shade_fused(scene, s, a, idx_m, bounce, interpret=True)
    )(state, aux)

    np.testing.assert_array_equal(
        np.asarray(new_state[12] > 0), np.asarray(stepped)
    )
    np.testing.assert_allclose(
        np.asarray(new_state[0:3].T), np.asarray(orig_x), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(new_state[3:6].T), np.asarray(dir_x), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(new_state[6:9].T), np.asarray(tput_x), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(new_state[9:12].T), np.asarray(rad_x), atol=1e-5
    )
    # segment counter: every alive-in ray traced one segment
    np.testing.assert_array_equal(
        np.asarray(new_state[14]), np.ones(R, np.float32)
    )


def test_fused_dead_rays_stay_dead(scene_and_rays):
    scene, orig, direction = scene_and_rays
    streams = rng.ray_streams(jnp.uint32(3), jnp.arange(R, dtype=jnp.int32))
    alive = jnp.zeros(R, bool)
    state = make_state16(
        orig, direction, jnp.ones((R, 3)), jnp.zeros((R, 3)), alive, streams
    )
    aux, tri, _ = trace_emit_aux(scene.mxu, state, interpret=True)
    new_state = shade_fused(scene, state, aux, tri, 0, interpret=True)
    assert not bool((new_state[12] > 0).any())
    np.testing.assert_array_equal(
        np.asarray(new_state[9:12]), np.zeros((3, R), np.float32)
    )
    np.testing.assert_array_equal(np.asarray(new_state[14]), np.zeros(R, np.float32))


def test_trace_emitted_records_match_gather(scene_and_rays):
    """The one-hot-MXU record output of the resident trace kernel must be
    bit-identical to the XLA gather it replaces (hit rays; missed rays get
    all-zero records, masked downstream), and the shaded state must match
    exactly with either record source."""
    scene, orig, direction = scene_and_rays
    streams = rng.ray_streams(jnp.uint32(11), jnp.arange(R, dtype=jnp.int32))
    alive = jnp.ones(R, bool)
    state = make_state16(
        orig, direction, jnp.ones((R, 3)), jnp.zeros((R, 3)), alive, streams
    )
    aux, idx_m, rec = trace_emit_aux(
        scene.mxu, state, rec_table=scene.shade_table_t, interpret=True
    )
    assert rec is not None and rec.shape == (24, R)
    gathered = jnp.take(scene.shade_table_t, idx_m, axis=1)
    hit = np.isfinite(np.asarray(aux[2]))
    np.testing.assert_array_equal(
        np.asarray(rec)[:, hit], np.asarray(gathered)[:, hit]
    )
    np.testing.assert_array_equal(
        np.asarray(rec)[:, ~hit], np.zeros((24, int((~hit).sum())), np.float32)
    )
    out_rec = shade_fused(scene, state, aux, idx_m, 1, interpret=True, rec=rec)
    out_gat = shade_fused(scene, state, aux, idx_m, 1, interpret=True)
    np.testing.assert_array_equal(np.asarray(out_rec), np.asarray(out_gat))


def test_streaming_trace_matches_resident(scene_and_rays, monkeypatch):
    """The HBM-streaming trace kernel (forced via the VMEM threshold) must
    agree exactly with the VMEM-resident kernel in interpret mode."""
    from zig_raytracing_contest_tpu.ops import mxu_intersect as mi

    scene, orig, direction = scene_and_rays
    streams = rng.ray_streams(jnp.uint32(5), jnp.arange(R, dtype=jnp.int32))
    alive = jnp.ones(R, bool)
    state = make_state16(
        orig, direction, jnp.ones((R, 3)), jnp.zeros((R, 3)), alive, streams
    )
    aux_a, idx_a, _ = trace_emit_aux(scene.mxu, state, interpret=True)
    monkeypatch.setattr(mi, "VMEM_RESIDENT_MAX_TRIS", 0)  # force streaming
    trace_emit_aux._clear_cache()
    aux_b, idx_b, _ = trace_emit_aux(scene.mxu, state, interpret=True)
    trace_emit_aux._clear_cache()
    # Rows 0-4 (u, v, t, streams, alive) are the contract; rows 5/6 are
    # traversal diagnostics (tiles swept / tree expansions) and legitimately
    # differ between the resident tile walk and the streaming group walk.
    np.testing.assert_array_equal(np.asarray(aux_a[:5]), np.asarray(aux_b[:5]))
    np.testing.assert_array_equal(np.asarray(idx_a), np.asarray(idx_b))


def test_path_kernel_matches_bounce_composition(scene_and_rays):
    """The whole-path kernel (all bounces in one Pallas call) runs the same
    trace/shade bodies as composing trace_emit_aux + shade_fused per bounce.

    On a single CPU device the two are BITWISE identical (verified when
    developing the kernel).  Under the suite's 8-virtual-device CPU client
    XLA:CPU contracts FMAs differently between the two program contexts
    (last-ULP-only drift in the f32 rows), so this pins: structural rows
    (alive / RNG streams / segments) exactly, value rows to tight
    tolerance."""
    from zig_raytracing_contest_tpu.render.fused import path_trace_fused

    scene, orig, direction = scene_and_rays
    assert scene.color_u16f_t is not None, "fixture must be one-hot sized"
    streams = rng.ray_streams(jnp.uint32(7), jnp.arange(R, dtype=jnp.int32))
    alive = jnp.ones(R, bool)
    state = make_state16(
        orig, direction, jnp.ones((R, 3)), jnp.zeros((R, 3)), alive, streams
    )
    max_bounce = 3
    out_mega = path_trace_fused(
        scene.mxu, state, scene.shade_table_t, scene.color_u16f_t,
        max_bounce, scene.emissive_all_dummy is not None,
        interpret=True, lane_block=512,
    )
    st = state
    prev = None  # previous-hit exclusion threads exactly like production
    for bounce in range(max_bounce):
        aux, tri_m, rec = trace_emit_aux(
            scene.mxu, st, rec_table=scene.shade_table_t, interpret=True,
            prev=prev,
        )
        prev = tri_m
        st = shade_fused(scene, st, aux, tri_m, bounce, interpret=True, rec=rec)
    a = np.asarray(out_mega)
    b = np.asarray(st)
    # Structural rows exact: alive (12), RNG streams bit pattern (13),
    # segment count (14), pad (15).
    np.testing.assert_array_equal(
        a[12:16].view(np.uint32), b[12:16].view(np.uint32)
    )
    # Value rows (origin/direction/throughput/radiance) to f32 tightness.
    np.testing.assert_allclose(a[0:12], b[0:12], rtol=3e-6, atol=1e-6)


# ---------------------------------------------------------------------------
# Paged texel bank (scene/types._pack_paged_bank + fused._fetch_paged):
# banks past the one-hot budget stay VMEM-resident as 2048-texel pages.
# ---------------------------------------------------------------------------


def test_paged_bank_layout():
    """bank[PAGE_ROWS·p + (4·corner + c)·PAGE_SUB + sub, col] must hold
    the CORNER texel of the texel whose TILED bank position is
    p·PAGE_TEXELS + sub·1024 + col, channel c, under the texture's wrap
    mode — the invariant _fetch_paged's slice/dot fetch relies on.  The
    tiled position is recomputed here independently of the bake: small
    textures (≤64×32) pack row-major at the front of the bank; larger
    ones page by 64×32-texel tiles, x-major over tiles, page-aligned
    (the same per-lane formula as fused._prep_math's tiled branch)."""
    from zig_raytracing_contest_tpu.scene.materials import INT32_MIN, INT32_MAX
    from zig_raytracing_contest_tpu.scene.types import (
        PAGE_ROWS,
        PAGE_SUB,
        PAGE_TEXELS,
        PAGE_TILE_H,
        PAGE_TILE_W,
        _pack_paged_bank,
        _tiled_texel_map,
    )

    rng_np = np.random.default_rng(0)
    # Texture 0: 64×72 repeat (4608 texels — TILED: 1×3 tile grid);
    # texture 1: 28×14 clamp (392 texels — small, row-major region).
    w0, h0, w1, h1 = 64, 72, 28, 14
    P = w0 * h0 + w1 * h1
    tex = rng_np.integers(0, 65536, size=(P, 4)).astype(np.uint16)
    desc = np.asarray(
        [
            [0, w0, h0, INT32_MIN, INT32_MAX, INT32_MIN, INT32_MAX],
            [w0 * h0, w1, h1, 0, w1 - 1, 0, h1 - 1],
        ],
        np.int32,
    )
    bank = _pack_paged_bank(tex, desc)
    # Placement policy: the small texture opens the bank; the large one
    # starts page-aligned after the small region; 3 tiles of 64×32.
    _, off_map, padded_total = _tiled_texel_map(P, desc)
    assert off_map[1] == 0 and off_map[0] == PAGE_TEXELS
    assert padded_total == 4 * PAGE_TEXELS
    assert bank.shape == (padded_total // PAGE_TEXELS * PAGE_ROWS, 1024)

    def corner_of(i, corner):
        if i >= w0 * h0:
            off, w, h, clamp = w0 * h0, w1, h1, True
        else:
            off, w, h, clamp = 0, w0, h0, False
        y, x = divmod(i - off, w)
        if corner & 1:
            x = min(x + 1, w - 1) if clamp else (x + 1) % w
        if corner & 2:
            y = min(y + 1, h - 1) if clamp else (y + 1) % h
        return off + y * w + x

    def q_of(i):
        if i >= w0 * h0:  # small: contiguous row-major at its base
            return int(off_map[1]) + (i - w0 * h0)
        y, x = divmod(i, w0)
        tiles_x = -(-w0 // PAGE_TILE_W)
        return (
            int(off_map[0])
            + ((y // PAGE_TILE_H) * tiles_x + x // PAGE_TILE_W) * PAGE_TEXELS
            + (y % PAGE_TILE_H) * PAGE_TILE_W
            + x % PAGE_TILE_W
        )

    for i in rng_np.integers(0, P, size=48):
        p, local = divmod(q_of(int(i)), PAGE_TEXELS)
        sub, col = divmod(local, 1024)
        for corner in range(4):
            j = corner_of(int(i), corner)
            for c in range(4):
                assert (
                    bank[PAGE_ROWS * p + (4 * corner + c) * PAGE_SUB + sub,
                         col]
                    == float(tex[j, c])
                )


def _write_paged_scene(path):
    """Cornell-like box whose walls carry a 128×96 texture (12288 texels
    — past ONEHOT_MAX_TEXELS so the scene bakes a PAGED bank, and past
    PAGE_TEXELS so the fetch loop crosses a page boundary) plus the
    1×1-translucent quad exercising the alpha path."""
    b = procedural.SceneBuilder()
    rng_np = np.random.default_rng(42)
    wall_img = rng_np.integers(40, 255, size=(96, 128, 4), dtype=np.uint8)
    wall_img[:, :, 3] = 255
    img_w = b.add_image_png(wall_img.astype(np.uint8))
    white = b.add_material(
        base_color_factor=(0.9, 0.9, 0.9, 1),
        base_color_texture=b.add_texture(img_w),
    )
    light = b.add_material(base_color_factor=(0, 0, 0, 1), emissive_factor=(4, 4, 4))
    img_t = b.add_image_png(np.asarray([[[255, 255, 255, 100]]], np.uint8))
    glass = b.add_material(
        base_color_texture=b.add_texture(img_t), alpha_mode="BLEND"
    )
    s = 1.0
    for center, uax, vax, mat in [
        ((0, -s, 0), (s, 0, 0), (0, 0, -s), white),
        ((0, s, 0), (s, 0, 0), (0, 0, s), light),
        ((0, 0, -s), (s, 0, 0), (0, s, 0), white),
        ((0, 0, 0.2), (0.6, 0, 0), (0, 0.6, 0), glass),
    ]:
        p, i, n, t = procedural.quad(center, uax, vax)
        b.add_mesh_node(p, i, mat, normals=n, texcoords=t)
    b.add_camera_node((0, 0, 3), (0, 0, 0), yfov=0.8, name="c")
    return b.write_gltf(path)


@pytest.fixture(scope="module")
def paged_scene_and_rays(tmp_path_factory):
    d = tmp_path_factory.mktemp("scenes_paged")
    gltf = load_gltf(_write_paged_scene(d / "p.gltf"))
    cam = load_camera(gltf, width=32, height=32)
    geo = load_geometry(gltf)
    scene = build_device_scene(
        geo, build_grid(geo.positions, (4, 4, 4)), load_materials(gltf), backend="mxu"
    )
    assert scene.color_u16f_t is None, "fixture must exceed the one-hot cap"
    assert scene.color_paged_t is not None, "fixture must fit the paged cap"

    xs = (np.arange(R) % 32 + 0.37).astype(np.float32)
    ys = (np.arange(R) // 32 + 0.61).astype(np.float32)
    dirs = (
        cam.lower_left_corner
        + cam.right * xs[:, None]
        + cam.up * ys[:, None]
    )
    dirs = (dirs / np.linalg.norm(dirs, axis=1, keepdims=True)).astype(np.float32)
    orig = np.tile(cam.origin, (R, 1)).astype(np.float32)
    return scene, jnp.asarray(orig), jnp.asarray(dirs)


def test_paged_shade_matches_gather_path(paged_scene_and_rays):
    """The paged single-kernel shade must produce the same state as the
    prep/gather/shade pipeline (itself pinned to the XLA oracle above).
    Texel values are exact u16 integers on both paths; value rows are
    compared to f32 tightness (separate kernel programs may contract FMAs
    differently), structural rows exactly."""
    scene, orig, direction = paged_scene_and_rays
    streams = rng.ray_streams(jnp.uint32(7), jnp.arange(R, dtype=jnp.int32))
    alive = jnp.ones(R, bool)
    state = make_state16(
        orig, direction, jnp.ones((R, 3)), jnp.zeros((R, 3)), alive, streams
    )
    aux, idx_m, rec = trace_emit_aux(
        scene.mxu, state, rec_table=scene.shade_table_t, interpret=True
    )
    assert int(np.isfinite(np.asarray(aux[2])).sum()) > R // 2
    out_paged = shade_fused(scene, state, aux, idx_m, 1, interpret=True, rec=rec)
    gather_scene = scene._replace(color_paged_t=None)
    out_gather = shade_fused(
        gather_scene, state, aux, idx_m, 1, interpret=True, rec=rec
    )
    a, bst = np.asarray(out_paged), np.asarray(out_gather)
    np.testing.assert_array_equal(
        a[12:16].view(np.uint32), bst[12:16].view(np.uint32)
    )
    np.testing.assert_allclose(a[0:12], bst[0:12], rtol=3e-6, atol=1e-6)


def test_paged_dead_rays_stay_dead(paged_scene_and_rays):
    scene, orig, direction = paged_scene_and_rays
    streams = rng.ray_streams(jnp.uint32(3), jnp.arange(R, dtype=jnp.int32))
    alive = jnp.zeros(R, bool)
    state = make_state16(
        orig, direction, jnp.ones((R, 3)), jnp.zeros((R, 3)), alive, streams
    )
    aux, tri, rec = trace_emit_aux(
        scene.mxu, state, rec_table=scene.shade_table_t, interpret=True
    )
    new_state = shade_fused(scene, state, aux, tri, 0, interpret=True, rec=rec)
    assert not bool((new_state[12] > 0).any())
    np.testing.assert_array_equal(
        np.asarray(new_state[9:12]), np.zeros((3, R), np.float32)
    )


def test_path_kernel_paged_matches_bounce_composition(paged_scene_and_rays):
    """Whole-path kernel with the PAGED bank vs per-bounce composition —
    same contract as the one-hot variant above."""
    from zig_raytracing_contest_tpu.render.fused import path_trace_fused

    scene, orig, direction = paged_scene_and_rays
    streams = rng.ray_streams(jnp.uint32(7), jnp.arange(R, dtype=jnp.int32))
    alive = jnp.ones(R, bool)
    state = make_state16(
        orig, direction, jnp.ones((R, 3)), jnp.zeros((R, 3)), alive, streams
    )
    max_bounce = 3
    out_mega = path_trace_fused(
        scene.mxu, state, scene.shade_table_t, scene.color_paged_t,
        max_bounce, scene.emissive_all_dummy is not None,
        interpret=True, lane_block=512,
    )
    st = state
    prev = None  # previous-hit exclusion threads exactly like production
    for bounce in range(max_bounce):
        aux, tri_m, rec = trace_emit_aux(
            scene.mxu, st, rec_table=scene.shade_table_t, interpret=True,
            prev=prev,
        )
        prev = tri_m
        st = shade_fused(scene, st, aux, tri_m, bounce, interpret=True, rec=rec)
    a = np.asarray(out_mega)
    bst = np.asarray(st)
    np.testing.assert_array_equal(
        a[12:16].view(np.uint32), bst[12:16].view(np.uint32)
    )
    np.testing.assert_allclose(a[0:12], bst[0:12], rtol=3e-6, atol=1e-6)


def test_paged_scene_end_to_end(tmp_path):
    """End-to-end render of a paged-bank scene through the production fused
    pipeline (whole-path kernel with the paged bank, interpret mode on
    CPU) vs the XLA shading path.  Float reassociation may move a few
    pixels by >2 LSBs; the images must otherwise agree."""
    from zig_raytracing_contest_tpu.config import Config
    from zig_raytracing_contest_tpu.render.pipeline import (
        prepare_scene,
        render_scene,
    )

    p = _write_paged_scene(tmp_path / "p.gltf")
    cfg = Config(
        grid_resolution=(4, 4, 4), num_samples=2, max_bounce=3, seed=5,
        wave_size=2048,
    )
    scene, cam, _ = prepare_scene(str(p), cfg, camera_name="c", width=24, height=24)
    assert scene.color_paged_t is not None
    img_f, stats_f = render_scene(scene, cam, cfg, use_fused=True)
    img_x, stats_x = render_scene(scene, cam, cfg, use_fused=False)
    assert stats_f.segments > 0
    diff = np.abs(img_f.astype(int) - img_x.astype(int))
    assert (diff > 2).mean() < 0.02


def test_paged_hbm_stream_matches_vmem(paged_scene_and_rays, monkeypatch):
    """Forcing the bank-residency threshold to 0 sends the paged fetch down
    the HBM page-stream path (double-buffered DMA into VMEM scratch,
    fused._fetch_paged hbm branch) — the transport for banks past
    PAGED_VMEM_MAX_BYTES, e.g. a 512×512 texture's 16 MB corner-expanded
    bank.  Per-bounce AND whole-path results must be bit-identical to the
    VMEM-resident paged fetch: same pages, same dots, different transport."""
    import zig_raytracing_contest_tpu.render.fused as fused_mod
    from zig_raytracing_contest_tpu.render.fused import path_trace_fused

    scene, orig, direction = paged_scene_and_rays
    streams = rng.ray_streams(jnp.uint32(7), jnp.arange(R, dtype=jnp.int32))
    state = make_state16(
        orig, direction, jnp.ones((R, 3)), jnp.zeros((R, 3)),
        jnp.ones(R, bool), streams,
    )
    aux, idx_m, rec = trace_emit_aux(
        scene.mxu, state, rec_table=scene.shade_table_t, interpret=True
    )

    def both():
        bounce = shade_fused(scene, state, aux, idx_m, 1, interpret=True,
                             rec=rec)
        path = path_trace_fused(
            scene.mxu, state, scene.shade_table_t, scene.color_paged_t,
            2, scene.emissive_all_dummy is not None,
            interpret=True, lane_block=512,
        )
        return np.asarray(bounce), np.asarray(path)

    assert not fused_mod._bank_hbm(scene.color_paged_t.shape)
    vmem_bounce, vmem_path = both()
    try:
        monkeypatch.setattr(fused_mod, "PAGED_VMEM_MAX_BYTES", 0)
        jax.clear_caches()  # the jitted entry points must re-trace
        assert fused_mod._bank_hbm(scene.color_paged_t.shape)
        hbm_bounce, hbm_path = both()
    finally:
        monkeypatch.undo()
        jax.clear_caches()  # don't leak HBM-traced graphs to later tests
    np.testing.assert_array_equal(vmem_bounce, hbm_bounce)
    np.testing.assert_array_equal(vmem_path, hbm_path)


def test_hbm_table_rec_emit_matches_vmem(scene_and_rays, monkeypatch):
    """Forcing the VMEM-table threshold to 0 sends the rec-emit kernel down
    the HBM-table path (winner-tile (24, tile) slices DMA'd on demand,
    mxu_intersect._extract_winner_records table_hbm) — the transport that
    lifts in-kernel record emission past REC_EMIT_MAX_TRIS to every
    resident scene, e.g. the 100k-triangle bench.  aux, winner ids, and
    records must be bit-identical to the VMEM-resident table path."""
    from zig_raytracing_contest_tpu.ops import mxu_intersect as mi

    scene, orig, direction = scene_and_rays
    streams = rng.ray_streams(jnp.uint32(13), jnp.arange(R, dtype=jnp.int32))
    alive = jnp.ones(R, bool)
    state = make_state16(
        orig, direction, jnp.ones((R, 3)), jnp.zeros((R, 3)), alive, streams
    )
    aux_a, idx_a, rec_a = trace_emit_aux(
        scene.mxu, state, rec_table=scene.shade_table_t, interpret=True
    )
    assert rec_a is not None
    monkeypatch.setattr(mi, "REC_EMIT_MAX_TRIS", 0)  # force the HBM table
    trace_emit_aux._clear_cache()
    try:
        aux_b, idx_b, rec_b = trace_emit_aux(
            scene.mxu, state, rec_table=scene.shade_table_t, interpret=True
        )
    finally:
        trace_emit_aux._clear_cache()
    assert rec_b is not None
    np.testing.assert_array_equal(np.asarray(aux_a[:5]), np.asarray(aux_b[:5]))
    np.testing.assert_array_equal(np.asarray(idx_a), np.asarray(idx_b))
    np.testing.assert_array_equal(np.asarray(rec_a), np.asarray(rec_b))


def test_streaming_rec_emit_matches_resident(scene_and_rays, monkeypatch):
    """The streaming kernel (forced via the VMEM threshold) must emit the
    SAME records, u/v, winner ids, and t as the resident rec-emit kernel:
    the deferred extraction DMAs both the table and bank winner-tile
    slices (mxu_intersect._extract_winner_records tri_hbm) — this is what
    gives 500k-2M-triangle scenes in-kernel record emission."""
    from zig_raytracing_contest_tpu.ops import mxu_intersect as mi

    scene, orig, direction = scene_and_rays
    streams = rng.ray_streams(jnp.uint32(17), jnp.arange(R, dtype=jnp.int32))
    alive = jnp.ones(R, bool)
    state = make_state16(
        orig, direction, jnp.ones((R, 3)), jnp.zeros((R, 3)), alive, streams
    )
    aux_a, idx_a, rec_a = trace_emit_aux(
        scene.mxu, state, rec_table=scene.shade_table_t, interpret=True
    )
    assert rec_a is not None
    monkeypatch.setattr(mi, "VMEM_RESIDENT_MAX_TRIS", 0)  # force streaming
    trace_emit_aux._clear_cache()
    try:
        aux_b, idx_b, rec_b = trace_emit_aux(
            scene.mxu, state, rec_table=scene.shade_table_t, interpret=True
        )
    finally:
        trace_emit_aux._clear_cache()
    assert rec_b is not None
    np.testing.assert_array_equal(np.asarray(aux_a[:5]), np.asarray(aux_b[:5]))
    np.testing.assert_array_equal(np.asarray(idx_a), np.asarray(idx_b))
    np.testing.assert_array_equal(np.asarray(rec_a), np.asarray(rec_b))


def test_shared_origin_b0_bit_identical(tmp_path, monkeypatch):
    """SHARED_ORIGIN_B0 collapses the bounce-0 origin transform to (Kt, 1)
    scalar-broadcast columns inside the gen kernel.  Every primary ray
    shares the pinhole camera origin, so the production image must be
    BIT-IDENTICAL to the per-lane variant (same f32 ops on equal values).
    Runs the full fused pipeline (whole-path kernel, interpret mode)."""
    from zig_raytracing_contest_tpu.config import Config
    from zig_raytracing_contest_tpu.render import fused
    from zig_raytracing_contest_tpu.render.pipeline import (
        prepare_scene,
        render_scene,
    )

    p = procedural.cornell_like_box(tmp_path / "so.gltf")
    cfg = Config(
        grid_resolution=(4, 4, 4), num_samples=2, max_bounce=3, seed=7,
        wave_size=2048,
    )
    scene, cam, _ = prepare_scene(
        str(p), cfg, camera_name="Camera 1", width=24, height=24
    )
    assert fused.SHARED_ORIGIN_B0  # production default
    img_a, st_a = render_scene(scene, cam, cfg, use_fused=True)
    monkeypatch.setattr(fused, "SHARED_ORIGIN_B0", False)
    jax.clear_caches()  # the flag is read at trace time, not a jit key
    try:
        img_b, st_b = render_scene(scene, cam, cfg, use_fused=True)
    finally:
        jax.clear_caches()
    np.testing.assert_array_equal(img_a, img_b)
    assert st_a.segments == st_b.segments


def test_shared_origin_b0_tree_paths_bit_identical(tmp_path, monkeypatch):
    """Same flag, ≥16-tile scene: bounce 0 with scalar origins must also be
    bit-identical through the TREE traversal (_cull_entry_batch's (N, 1)
    scalar-broadcast branch) — the small-scene test only covers the flat
    sweep.  36-side terrain = 2592 tris = 21 tiles ≥ TREE_MIN_TILES."""
    import sys
    from pathlib import Path as _P

    sys.path.insert(0, str(_P(__file__).resolve().parent.parent))
    from bench import build_large_scene
    from zig_raytracing_contest_tpu.config import Config
    from zig_raytracing_contest_tpu.render import fused
    from zig_raytracing_contest_tpu.render.pipeline import (
        prepare_scene,
        render_scene,
    )

    p = build_large_scene(tmp_path / "t.gltf", side=36)
    cfg = Config(num_samples=1, max_bounce=2, seed=3, wave_size=2048)
    scene, cam, _ = prepare_scene(
        str(p), cfg, camera_name="Camera 1", width=16, height=16
    )
    from zig_raytracing_contest_tpu.render.wavefront import whole_path_regime

    assert whole_path_regime(scene, use_fused=True)
    assert scene.mxu.tile_bbox.shape[1] >= 16  # tree traversal engaged
    img_a, st_a = render_scene(scene, cam, cfg, use_fused=True)
    monkeypatch.setattr(fused, "SHARED_ORIGIN_B0", False)
    jax.clear_caches()
    try:
        img_b, st_b = render_scene(scene, cam, cfg, use_fused=True)
    finally:
        jax.clear_caches()
    np.testing.assert_array_equal(img_a, img_b)
    assert st_a.segments == st_b.segments


def test_trace_shared_origin_matches_per_lane(scene_and_rays, monkeypatch):
    """trace_emit_aux(origin=cam) must be bit-identical to the per-lane
    path when every lane's state rows 0-2 hold the camera origin — in the
    VMEM-resident kernel AND the HBM-streaming kernel (forced via the
    residency threshold).  This is the per-bounce pipeline's bounce-0
    fast path (render_wave)."""
    from zig_raytracing_contest_tpu.ops import mxu_intersect as mi

    scene, orig, direction = scene_and_rays
    streams = rng.ray_streams(jnp.uint32(11), jnp.arange(R, dtype=jnp.int32))
    alive = jnp.ones(R, bool)
    state = make_state16(
        orig, direction, jnp.ones((R, 3)), jnp.zeros((R, 3)), alive, streams
    )
    cam = orig[0]  # every row of orig is the camera origin
    for force_streaming in (False, True):
        if force_streaming:
            monkeypatch.setattr(mi, "VMEM_RESIDENT_MAX_TRIS", 0)
        trace_emit_aux._clear_cache()
        try:
            aux_a, idx_a, rec_a = trace_emit_aux(
                scene.mxu, state, rec_table=scene.shade_table_t,
                interpret=True,
            )
            aux_b, idx_b, rec_b = trace_emit_aux(
                scene.mxu, state, rec_table=scene.shade_table_t,
                interpret=True, origin=cam,
            )
        finally:
            trace_emit_aux._clear_cache()
        np.testing.assert_array_equal(np.asarray(aux_a[:5]),
                                      np.asarray(aux_b[:5]))
        np.testing.assert_array_equal(np.asarray(idx_a), np.asarray(idx_b))
        np.testing.assert_array_equal(np.asarray(rec_a), np.asarray(rec_b))


def test_mid_resort_matches_composition(scene_and_rays, monkeypatch):
    """_finish_path_sorted with a mid-path resort (MID_RESORT_BOUNCES) must
    produce the same radiance/segments as the straight per-bounce
    composition: the resort permutes lanes between kernel calls and
    restores wave order at the end — per-lane math is lane-order
    independent (block culls are conservative), so only program-boundary
    FMA contraction may drift value rows by ULPs."""
    import zig_raytracing_contest_tpu.render.wavefront as wf
    from zig_raytracing_contest_tpu.ops.mxu_intersect import EXCLUDE_PREV_HIT
    from zig_raytracing_contest_tpu.render.fused import path_trace_fused
    from zig_raytracing_contest_tpu.render.wavefront import (
        _finish_path_sorted,
    )

    scene, orig, direction = scene_and_rays
    streams = rng.ray_streams(jnp.uint32(7), jnp.arange(R, dtype=jnp.int32))
    alive = jnp.ones(R, bool)
    state = make_state16(
        orig, direction, jnp.ones((R, 3)), jnp.zeros((R, 3)), alive, streams
    )
    max_bounce = 3
    # --- reference: unsorted per-bounce composition over all 3 bounces
    st = state
    prev = None
    for bounce in range(max_bounce):
        aux, tri_m, rec = trace_emit_aux(
            scene.mxu, st, rec_table=scene.shade_table_t, interpret=True,
            prev=prev if EXCLUDE_PREV_HIT else None,
        )
        prev = tri_m
        st = shade_fused(scene, st, aux, tri_m, bounce, interpret=True,
                         rec=rec)

    # --- production shape: bounce-0 kernel + resorts after bounces 0 AND 1
    out = path_trace_fused(
        scene.mxu, state, scene.shade_table_t, scene.color_u16f_t,
        1, scene.emissive_all_dummy is not None,
        interpret=True, lane_block=512, emit_idx=EXCLUDE_PREV_HIT,
    )
    state1, idx0 = out if EXCLUDE_PREV_HIT else (out, None)
    monkeypatch.setattr(wf, "MID_RESORT_BOUNCES", (1,))
    jax.clear_caches()
    try:
        rows4 = _finish_path_sorted(
            scene, scene.color_u16f_t, state1, idx0, max_bounce,
            scene.emissive_all_dummy is not None, interpret=True,
        )
    finally:
        jax.clear_caches()
    np.testing.assert_allclose(
        np.asarray(rows4[0:3]), np.asarray(st[9:12]), rtol=3e-6, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(rows4[3]), np.asarray(st[14]))


def test_mid_resort_prefix_matches_composition(scene_and_rays, monkeypatch):
    """MID_RESORT_PREFIX sorts only the first R//prefix lanes of a
    mid-path resort — a different permutation choice, never a semantic
    one, so the unsorted per-bounce composition must still match.  Rays
    are tiled to R=2048 so the 1024-aligned prefix actually engages
    (P=1024 < R)."""
    import zig_raytracing_contest_tpu.render.wavefront as wf
    from zig_raytracing_contest_tpu.ops.mxu_intersect import EXCLUDE_PREV_HIT
    from zig_raytracing_contest_tpu.render.fused import path_trace_fused
    from zig_raytracing_contest_tpu.render.wavefront import (
        _finish_path_sorted,
    )

    scene, orig, direction = scene_and_rays
    R2 = 2 * R
    streams = rng.ray_streams(jnp.uint32(23), jnp.arange(R2, dtype=jnp.int32))
    alive = jnp.ones(R2, bool)
    orig2 = jnp.concatenate([orig, orig])
    dir2 = jnp.concatenate([direction, direction])
    state = make_state16(
        orig2, dir2, jnp.ones((R2, 3)), jnp.zeros((R2, 3)), alive, streams
    )
    max_bounce = 3
    st = state
    prev = None
    for bounce in range(max_bounce):
        aux, tri_m, rec = trace_emit_aux(
            scene.mxu, st, rec_table=scene.shade_table_t, interpret=True,
            prev=prev if EXCLUDE_PREV_HIT else None,
        )
        prev = tri_m
        st = shade_fused(scene, st, aux, tri_m, bounce, interpret=True,
                         rec=rec)

    out = path_trace_fused(
        scene.mxu, state, scene.shade_table_t, scene.color_u16f_t,
        1, scene.emissive_all_dummy is not None,
        interpret=True, lane_block=512, emit_idx=EXCLUDE_PREV_HIT,
    )
    state1, idx0 = out if EXCLUDE_PREV_HIT else (out, None)
    monkeypatch.setattr(wf, "MID_RESORT_BOUNCES", (1,))
    monkeypatch.setattr(wf, "MID_RESORT_PREFIX", 2)
    jax.clear_caches()
    try:
        rows4 = _finish_path_sorted(
            scene, scene.color_u16f_t, state1, idx0, max_bounce,
            scene.emissive_all_dummy is not None, interpret=True,
        )
    finally:
        jax.clear_caches()
    np.testing.assert_allclose(
        np.asarray(rows4[0:3]), np.asarray(st[9:12]), rtol=3e-6, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(rows4[3]), np.asarray(st[14]))


def test_mid_resort_needset_key_matches_composition(scene_and_rays,
                                                    monkeypatch):
    """MID_SORT_NEEDSET swaps the mid-resort key for the first-3-needed-
    tile signature (wavefront._mid_sort_key) — again only a permutation
    choice, so the unsorted per-bounce composition must still match."""
    import zig_raytracing_contest_tpu.render.wavefront as wf
    from zig_raytracing_contest_tpu.ops.mxu_intersect import EXCLUDE_PREV_HIT
    from zig_raytracing_contest_tpu.render.fused import path_trace_fused
    from zig_raytracing_contest_tpu.render.wavefront import (
        _finish_path_sorted,
        _mid_sort_key,
    )

    scene, orig, direction = scene_and_rays
    streams = rng.ray_streams(jnp.uint32(11), jnp.arange(R, dtype=jnp.int32))
    alive = jnp.ones(R, bool)
    state = make_state16(
        orig, direction, jnp.ones((R, 3)), jnp.zeros((R, 3)), alive, streams
    )
    # Key invariants: int32, dead lanes strictly after live lanes.
    dead_state = state.at[12].set(
        jnp.where(jnp.arange(R) % 3 == 0, 0.0, 1.0)
    )
    key = _mid_sort_key(scene, dead_state)
    assert key.dtype == jnp.int32
    kn = np.asarray(key)
    dead = np.arange(R) % 3 == 0
    assert kn[dead].min() > kn[~dead].max()

    max_bounce = 3
    st = state
    prev = None
    for bounce in range(max_bounce):
        aux, tri_m, rec = trace_emit_aux(
            scene.mxu, st, rec_table=scene.shade_table_t, interpret=True,
            prev=prev if EXCLUDE_PREV_HIT else None,
        )
        prev = tri_m
        st = shade_fused(scene, st, aux, tri_m, bounce, interpret=True,
                         rec=rec)

    out = path_trace_fused(
        scene.mxu, state, scene.shade_table_t, scene.color_u16f_t,
        1, scene.emissive_all_dummy is not None,
        interpret=True, lane_block=512, emit_idx=EXCLUDE_PREV_HIT,
    )
    state1, idx0 = out if EXCLUDE_PREV_HIT else (out, None)
    monkeypatch.setattr(wf, "MID_RESORT_BOUNCES", (1,))
    monkeypatch.setattr(wf, "MID_SORT_NEEDSET", True)
    jax.clear_caches()
    try:
        rows4 = _finish_path_sorted(
            scene, scene.color_u16f_t, state1, idx0, max_bounce,
            scene.emissive_all_dummy is not None, interpret=True,
        )
    finally:
        jax.clear_caches()
    np.testing.assert_allclose(
        np.asarray(rows4[0:3]), np.asarray(st[9:12]), rtol=3e-6, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(rows4[3]), np.asarray(st[14]))


def test_mid_resort_end_to_end(tmp_path, monkeypatch):
    """Full fused-pipeline render with mid-path resorts on vs off: the
    resort only regroups lanes between whole-path kernel calls, so the
    image must agree up to program-boundary ULP drift (the scene is fully
    opaque — no stochastic-alpha decorrelation) and the traced segment
    count must be identical (a closed box: alive transitions are
    hit-robust)."""
    import zig_raytracing_contest_tpu.render.wavefront as wf
    from zig_raytracing_contest_tpu.config import Config
    from zig_raytracing_contest_tpu.render.pipeline import (
        prepare_scene,
        render_scene,
    )

    p = procedural.cornell_like_box(tmp_path / "mr.gltf")
    cfg = Config(
        grid_resolution=(4, 4, 4), num_samples=2, max_bounce=4, seed=9,
        wave_size=2048,
    )
    scene, cam, _ = prepare_scene(
        str(p), cfg, camera_name="Camera 1", width=24, height=24
    )
    assert wf.MID_RESORT_BOUNCES == (1,)  # chip-A/B'd default (+17%)
    monkeypatch.setattr(wf, "MID_RESORT_BOUNCES", ())
    jax.clear_caches()  # the flag binds at trace time, not a jit key
    img_a, st_a = render_scene(scene, cam, cfg, use_fused=True)
    monkeypatch.setattr(wf, "MID_RESORT_BOUNCES", (1, 2))
    jax.clear_caches()  # the flag binds at trace time, not a jit key
    try:
        img_b, st_b = render_scene(scene, cam, cfg, use_fused=True)
    finally:
        jax.clear_caches()
    diff = np.abs(img_a.astype(int) - img_b.astype(int))
    assert (diff > 2).mean() < 0.02
    assert st_a.segments == st_b.segments


def test_emit_sort_key_matches_host_key(scene_and_rays):
    """The in-kernel beam-sort key (_emit_sort_key, consumed by the
    whole-path pipeline's post-bounce-0 argsort) must be bit-identical to
    the host key wavefront._ray_sort_key for every lane — both in the
    corridor (SORT_KEY_EXIT) and legacy direction variants."""
    from functools import partial

    import jax.experimental.pallas as pl

    import zig_raytracing_contest_tpu.render.wavefront as wf
    from zig_raytracing_contest_tpu.render import fused
    from zig_raytracing_contest_tpu.render.wavefront import build_gen_par

    scene, orig, dirs = scene_and_rays
    Rk = 256
    state = np.zeros((16, Rk), np.float32)
    state[0:3] = np.asarray(orig)[:Rk].T
    state[3:6] = np.asarray(dirs)[:Rk].T
    state[12] = 1.0
    state[12, 5:9] = 0.0  # a few dead lanes
    par = build_gen_par(
        scene,
        jnp.zeros(3, jnp.float32), jnp.zeros(3, jnp.float32),
        jnp.zeros(3, jnp.float32), jnp.zeros(3, jnp.float32),
    )

    def kernel(state_ref, par_ref, out_ref):
        out_ref[:, :] = state_ref[:, :]
        fused._emit_sort_key(out_ref, par_ref)

    for variant in (True, False):
        old = wf.SORT_KEY_EXIT
        try:
            wf.SORT_KEY_EXIT = variant
            # the flag binds at trace time; drop the cached trace of the
            # previous variant (same shapes -> same cache key otherwise)
            jax.clear_caches()
            run = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((16, Rk), jnp.float32),
                interpret=True,
            )
            out = run(jnp.asarray(state), par)
            got = np.asarray(
                jax.lax.bitcast_convert_type(out[15], jnp.int32)
            )
            want = np.asarray(wf._ray_sort_key(scene, jnp.asarray(state)))
            # The host key divides by raw d (inf-based slab); the kernel
            # clamps |d| >= 1e-12 — identical for all practical
            # directions, so require exact equality here (fixture rays
            # have no zero components).
            np.testing.assert_array_equal(got, want, err_msg=f"{variant=}")
        finally:
            wf.SORT_KEY_EXIT = old
