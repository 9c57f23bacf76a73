"""Morton-heap tree traversal (ops/mxu_intersect) vs the flat XLA oracle.

The resident trace kernels switch to a depth-first traversal of the baked
tile heap once a scene has TREE_MIN_TILES tiles; the fuzz suites' scenes
are smaller, so this pins the tree path explicitly: same nearest hit as
``nearest_hit_xla`` on every ACTIVE lane (inactive lanes are unspecified
in trace_emit_aux — its callers mask by the alive row).
"""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from zig_raytracing_contest_tpu.ops import rng
from zig_raytracing_contest_tpu.ops.mxu_intersect import (
    TREE_MIN_TILES,
    bake_triangles,
    nearest_hit_xla,
    trace_emit_aux,
)

pytestmark = pytest.mark.slow  # interpret-mode Pallas kernel equality (minutes)


def _random_bank(seed, T=4000, tile=128):
    r = np.random.default_rng(seed)
    v0 = r.uniform(-5, 5, (T, 3)).astype(np.float32)
    e1 = r.normal(0, 0.5, (T, 3)).astype(np.float32)
    e2 = r.normal(0, 0.5, (T, 3)).astype(np.float32)
    return bake_triangles(v0, e1, e2, tile=tile)


def test_tree_bake_shapes():
    tris = _random_bank(0)
    num_tiles = tris.tile_bbox.shape[1]
    assert num_tiles >= TREE_MIN_TILES
    p2 = tris.tree_bbox.shape[1] // 2
    assert p2 >= num_tiles and p2 & (p2 - 1) == 0
    tree = np.asarray(tris.tree_bbox)
    # Leaves hold the tile boxes; padded leaves are the always-miss box.
    np.testing.assert_array_equal(
        tree[:, p2 : p2 + num_tiles], np.asarray(tris.tile_bbox)
    )
    if p2 > num_tiles:
        assert np.all(tree[:, p2 + num_tiles :] == np.inf)
    # Every internal node bounds its children (ignoring always-miss nodes).
    for i in range(1, p2):
        box = tree[:, i]
        if np.all(box == np.inf):
            continue
        for c in (2 * i, 2 * i + 1):
            child = tree[:, c]
            if np.all(child == np.inf):
                continue
            assert np.all(box[0:3] <= child[0:3] + 1e-6)
            assert np.all(box[3:6] >= child[3:6] - 1e-6)


def test_tree_traversal_matches_oracle():
    tris = _random_bank(3)
    R = 1024
    streams = rng.ray_streams(jnp.uint32(5), jnp.arange(R, dtype=jnp.int32))
    org = (
        jnp.stack([rng.uniform(streams, 40 + k) for k in range(3)], 1) * 16.0
        - 8.0
    )
    g = jnp.stack([rng.normal3(streams, 9)[:, a] for a in range(3)], 1)
    d = g / jnp.linalg.norm(g, axis=1, keepdims=True)
    active = rng.uniform(streams, 50) < 0.9

    t_x, i_x, u_x, v_x = nearest_hit_xla(tris, org, d, active)

    state = jnp.concatenate(
        [
            org.T,
            d.T,
            jnp.ones((3, R)),
            jnp.zeros((3, R)),
            active.astype(jnp.float32)[None],
            jax.lax.bitcast_convert_type(streams, jnp.float32)[None],
            jnp.zeros((2, R)),
        ],
        axis=0,
    ).astype(jnp.float32)
    aux, idx_m, _ = trace_emit_aux(tris, state, interpret=True)

    act = np.asarray(active)
    t_k = np.asarray(aux[2])
    t_o = np.asarray(t_x)
    hit = act & np.isfinite(t_o)
    assert hit.sum() > 100  # the scene must actually get hit
    np.testing.assert_array_equal(t_k[act], t_o[act])
    np.testing.assert_array_equal(np.asarray(idx_m)[hit], np.asarray(i_x)[hit])
    np.testing.assert_array_equal(np.asarray(aux[0])[hit], np.asarray(u_x)[hit])
    np.testing.assert_array_equal(np.asarray(aux[1])[hit], np.asarray(v_x)[hit])


def test_subbeam_traversal_matches_oracle(monkeypatch):
    """SUBBEAM_TRAVERSE > 1 runs one independent heap walk per 128-lane
    sub-range (own stack, own running best, own cull union).  The nearest
    hit must match the flat XLA oracle exactly on every active lane —
    per-lane nearest-hit folding is order-independent."""
    from zig_raytracing_contest_tpu.ops import mxu_intersect as mi

    tris = _random_bank(7)
    R = 1024
    streams = rng.ray_streams(jnp.uint32(21), jnp.arange(R, dtype=jnp.int32))
    org = (
        jnp.stack([rng.uniform(streams, 40 + k) for k in range(3)], 1) * 16.0
        - 8.0
    )
    g = jnp.stack([rng.normal3(streams, 9)[:, a] for a in range(3)], 1)
    d = g / jnp.linalg.norm(g, axis=1, keepdims=True)
    active = rng.uniform(streams, 50) < 0.9

    t_x, i_x, u_x, v_x = nearest_hit_xla(tris, org, d, active)
    state = _state16(org, d, active, streams, R)

    monkeypatch.setattr(mi, "SUBBEAM_TRAVERSE", 4)
    trace_emit_aux._clear_cache()
    aux, idx_m, _ = trace_emit_aux(tris, state, interpret=True)
    trace_emit_aux._clear_cache()

    act = np.asarray(active)
    t_o = np.asarray(t_x)
    hit = act & np.isfinite(t_o)
    assert hit.sum() > 100
    np.testing.assert_array_equal(np.asarray(aux[2])[act], t_o[act])
    np.testing.assert_array_equal(np.asarray(idx_m)[hit], np.asarray(i_x)[hit])
    np.testing.assert_array_equal(np.asarray(aux[0])[hit], np.asarray(u_x)[hit])
    np.testing.assert_array_equal(np.asarray(aux[1])[hit], np.asarray(v_x)[hit])


def test_streaming_group_tree_matches_oracle(monkeypatch):
    """The HBM-streaming kernel's tree-over-groups traversal (forced via
    the VMEM threshold, with enough groups to cross the tree gate) agrees
    with the flat XLA oracle on every active lane."""
    from zig_raytracing_contest_tpu.ops import mxu_intersect as mi

    # 16384 triangles @ tile 128 -> 128 tiles -> 16 groups (>= gate).
    tris = _random_bank(11, T=16384, tile=128)
    assert tris.group_bbox.shape[1] >= TREE_MIN_TILES

    R = 512
    streams = rng.ray_streams(jnp.uint32(9), jnp.arange(R, dtype=jnp.int32))
    org = (
        jnp.stack([rng.uniform(streams, 40 + k) for k in range(3)], 1) * 16.0
        - 8.0
    )
    g = jnp.stack([rng.normal3(streams, 9)[:, a] for a in range(3)], 1)
    d = g / jnp.linalg.norm(g, axis=1, keepdims=True)
    active = rng.uniform(streams, 50) < 0.9

    t_x, i_x, _, _ = nearest_hit_xla(tris, org, d, active)

    state = jnp.concatenate(
        [
            org.T,
            d.T,
            jnp.ones((3, R)),
            jnp.zeros((3, R)),
            active.astype(jnp.float32)[None],
            jax.lax.bitcast_convert_type(streams, jnp.float32)[None],
            jnp.zeros((2, R)),
        ],
        axis=0,
    ).astype(jnp.float32)
    monkeypatch.setattr(mi, "VMEM_RESIDENT_MAX_TRIS", 0)  # force streaming
    trace_emit_aux._clear_cache()
    aux, idx_m, _ = trace_emit_aux(tris, state, interpret=True)
    trace_emit_aux._clear_cache()

    act = np.asarray(active)
    t_o = np.asarray(t_x)
    hit = act & np.isfinite(t_o)
    assert hit.sum() > 50
    np.testing.assert_array_equal(np.asarray(aux[2])[act], t_o[act])
    np.testing.assert_array_equal(np.asarray(idx_m)[hit], np.asarray(i_x)[hit])


def test_streaming_wide_tile_matches_oracle(monkeypatch):
    """Huge scenes bake with DOUBLED tiles to keep the SMEM bbox tables
    bounded (scene/types._stream_tile) — pin the streaming kernel at
    tile=512 (the 4M-triangle geometry) against the flat XLA oracle."""
    from zig_raytracing_contest_tpu.ops import mxu_intersect as mi

    tris = _random_bank(13, T=16384, tile=512)
    assert tris.tile == 512 and tris.tile_bbox.shape[1] == 32

    R = 512
    streams = rng.ray_streams(jnp.uint32(17), jnp.arange(R, dtype=jnp.int32))
    org = (
        jnp.stack([rng.uniform(streams, 40 + k) for k in range(3)], 1) * 16.0
        - 8.0
    )
    g = jnp.stack([rng.normal3(streams, 9)[:, a] for a in range(3)], 1)
    d = g / jnp.linalg.norm(g, axis=1, keepdims=True)
    active = rng.uniform(streams, 50) < 0.9

    t_x, i_x, _, _ = nearest_hit_xla(tris, org, d, active)

    state = jnp.concatenate(
        [
            org.T,
            d.T,
            jnp.ones((3, R)),
            jnp.zeros((3, R)),
            active.astype(jnp.float32)[None],
            jax.lax.bitcast_convert_type(streams, jnp.float32)[None],
            jnp.zeros((2, R)),
        ],
        axis=0,
    ).astype(jnp.float32)
    monkeypatch.setattr(mi, "VMEM_RESIDENT_MAX_TRIS", 0)  # force streaming
    trace_emit_aux._clear_cache()
    aux, idx_m, _ = trace_emit_aux(tris, state, interpret=True)
    trace_emit_aux._clear_cache()

    act = np.asarray(active)
    t_o = np.asarray(t_x)
    hit = act & np.isfinite(t_o)
    assert hit.sum() > 50
    np.testing.assert_array_equal(np.asarray(aux[2])[act], t_o[act])
    np.testing.assert_array_equal(np.asarray(idx_m)[hit], np.asarray(i_x)[hit])


def test_stream_tile_plan():
    from zig_raytracing_contest_tpu.scene.types import (
        STREAM_MAX_TILES,
        _stream_tile,
    )

    assert _stream_tile(100_000) == 256
    assert _stream_tile(256 * STREAM_MAX_TILES) == 256
    assert _stream_tile(256 * STREAM_MAX_TILES + 1) == 512
    assert _stream_tile(4_000_000) == 512
    assert _stream_tile(8_300_000) == 1024


def _state16(org, d, active, streams, R):
    return jnp.concatenate(
        [
            org.T,
            d.T,
            jnp.ones((3, R)),
            jnp.zeros((3, R)),
            active.astype(jnp.float32)[None],
            jax.lax.bitcast_convert_type(streams, jnp.float32)[None],
            jnp.zeros((2, R)),
        ],
        axis=0,
    ).astype(jnp.float32)


def test_seed_prev_tile_exact(monkeypatch):
    """SEED_PREV_TILE only changes tile VISIT ORDER (previous-hit tiles
    sweep first to seed best-t); the nearest hit, barycentrics, and winner
    id must be identical with the seed on and off, on both the resident
    tree path and the HBM-streaming group-tree path."""
    from zig_raytracing_contest_tpu.ops import mxu_intersect as mi

    tris = _random_bank(17, T=16384, tile=128)
    R = 512
    streams = rng.ray_streams(jnp.uint32(13), jnp.arange(R, dtype=jnp.int32))
    org = (
        jnp.stack([rng.uniform(streams, 40 + k) for k in range(3)], 1) * 16.0
        - 8.0
    )
    g = jnp.stack([rng.normal3(streams, 9)[:, a] for a in range(3)], 1)
    d = g / jnp.linalg.norm(g, axis=1, keepdims=True)
    active = rng.uniform(streams, 50) < 0.9
    state = _state16(org, d, active, streams, R)
    # Synthetic previous hits spread over many tiles (any valid id works:
    # the seed must be exact for EVERY prev, not just true previous hits).
    prev = jnp.asarray(
        np.random.default_rng(5).integers(0, 16384, R, dtype=np.int32)
    )

    for force_streaming in (False, True):
        if force_streaming:
            monkeypatch.setattr(mi, "VMEM_RESIDENT_MAX_TRIS", 0)
        outs = []
        for seed_on in (True, False):
            monkeypatch.setattr(mi, "SEED_PREV_TILE", seed_on)
            trace_emit_aux._clear_cache()
            aux, idx_m, _ = trace_emit_aux(
                tris, state, interpret=True, prev=prev
            )
            outs.append((np.asarray(aux[:5]), np.asarray(idx_m)))
        trace_emit_aux._clear_cache()
        monkeypatch.undo()
        act = np.asarray(active)
        (aux_a, idx_a), (aux_b, idx_b) = outs
        assert np.isfinite(aux_a[2][act]).sum() > 50
        np.testing.assert_array_equal(aux_a[:, act], aux_b[:, act])
        hit = act & np.isfinite(aux_a[2])
        np.testing.assert_array_equal(idx_a[hit], idx_b[hit])
