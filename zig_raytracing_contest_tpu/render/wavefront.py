"""Wavefront path tracer: the reference's recursive per-pixel loop
(src/stage3.zig:188-256) re-architected as bounce rounds over a flat ray wave.

Why wavefront: recursion and per-ray control flow don't map to TPU.  Every
bounce is one vectorized round over (R,) rays carrying radiance / throughput
/ alive accumulators; the unrolled bounce loop reproduces ``emissive +
albedo * recurse(depth-1)`` as ``radiance += throughput * emissive;
throughput *= albedo`` and the stochastic-alpha pass-through
(src/stage3.zig:207-213: same direction, origin offset by t + FLT_EPSILON,
consumes a bounce) as a masked direction hold.  Continuation traces exclude
the previous hit triangle (ops.mxu_intersect.EXCLUDE_PREV_HIT): the
reference's nudge is a rounding no-op at t >= 2, so same-triangle re-hits
are phantom by construction and backend-rounding-dependent — excluding
them makes renders deterministic across backends.

TPU-shaping decisions, all measured on the v5e chip:

* The production intersector is the MXU/Pallas brute-force backend
  (ops/mxu_intersect.py); the grid/gather traversal below is the
  semantically-identical fallback for giant scenes.
* Per-op fixed cost dominates small ops here, so shading favors FEW, WIDE
  operations: one fat (R, 32) shade-record gather, (R, 4) texel row
  gathers, AoS (R, 3) vector math.  (A full SoA/(R,)-scalar rewrite and a
  lax.scan bounce loop were both tried and measured ~2× slower.)
* No integer div/mod anywhere hot — TPU VPUs expand them ~250× slower than
  float math (see ops/texture.py and _exact_divmod_f32).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import dda, linalg, rng
from ..ops.texture import sample_texture
from ..scene.types import DeviceScene

FLT_EPSILON = float(jnp.finfo(jnp.float32).eps)  # std.math.floatEps(f32)
INF = jnp.inf

# Triangles tested per ray per while-loop iteration in the grid fallback.
TRI_BATCH = 4

# Sort bounce rays only when the baked bank is in the HBM-streaming regime
# (ops/mxu_intersect.VMEM_RESIDENT_MAX_TRIS): below it a bounce's trace is
# cheaper than the sort itself.
SORT_MIN_TRIS = 1 << 16

# Whole-path-kernel scenes: split the path at bounce 0 and compact/beam-
# sort the survivors once (see render_wave).
SORT_AFTER_BOUNCE0 = True

# Mid-path resorts (round 5): additional absolute bounces after which the
# whole-path wave re-sorts/compacts (on top of the bounce-0 split).  The
# round-4 frame profile showed bounces 1-3 costing 2.9× bounce 0 with only
# ~13% of rays alive: rays dying at bounce ≥ 1 stay scattered through live
# blocks, so later sweeps pay for dead lanes — the reference pays NOTHING
# for a terminated path (src/stage3.zig:195-197).  Each entry r (1 ≤ r ≤
# max_bounce-2) costs one extra payload sort (~2-3 ms per 2^19-ray wave,
# scripts/micro_sort.py) and buys dead-lane compaction + fresh corridor
# keys (origins move every bounce) for bounces > r.
#
# Chip A/B/A (scripts/ab_resort.py, one process, 2026-08-20, official
# 1080p 3spp 4bounce; session baseline drifted 28.4 → 26.9 over the run):
#   ()      28.387 / 26.904 median (bracket)
#   (1,)    32.297  ← +17% vs bracket mean — SHIPPED
#   (2,)    30.152
#   (1, 2)  26.995  ← two full-wave sorts cost more than bounce-3 saves
MID_RESORT_BOUNCES: tuple = (1,)

# Prefix mid-resorts: sort only the first R // MID_RESORT_PREFIX lanes
# (block-aligned) of each MID-path resort (the bounce-0 sort is always
# full-wave).  Rationale: the bounce-0 sort puts every dead ray at the
# wave tail, and rays only die — so at any later resort, every lane whose
# status or position can still matter sits in the live prefix left by the
# previous sort.  On the official scene ~13% of lanes survive bounce 0, so
# a 1/4 prefix covers the live region with margin while the payload sort
# (whose cost is lane-count-proportional and live-fraction-independent)
# shrinks 4×.  Lanes past the prefix keep their previous sorted position
# (correctness is permutation-invariant; only sweep grouping changes).
# 1 = full-wave (no prefix).
MID_RESORT_PREFIX: int = 1

# Mid-resort key family.  The corridor key (_ray_sort_key) is blind to
# which tiles a bounced ray can actually reach; cull_sim.py --simresort
# (official-scene dump, 2026-08-20) shows sorting by the lane's
# UNOCCLUDED tile-need set (slab entry order, no trace knowledge) cuts
# the occlusion-ideal per-512-block union from 7.0 -> 3.5 at bounce 2 and
# 6.25 -> 2.25 at bounce 3 — matching the full need-set oracle — and a
# 3-id truncation with a corridor tiebreak (the int32 key budget) loses
# nothing.  When True, mid-path resorts (never bounce 0) sort by
# _mid_sort_key: first-3 needed box ids (tiles when the scene has
# <= NEEDSET_TILE_MAX, else 8-tile groups) + corridor-Morton tail bits.
# The slab pre-pass costs O(boxes x lanes) VPU ops at resort time.
MID_SORT_NEEDSET: bool = False
NEEDSET_TILE_MAX: int = 128

# When False, HBM-streaming scenes (> VMEM_RESIDENT_MAX_TRIS) skip the
# in-kernel winner-record/u-v emission and fall back to the XLA record
# gather + recompute_uv — the pre-in-kernel-emission behavior, kept as a
# same-process A/B lever (scripts/ab_stream_rec.py).
STREAM_REC_IN_KERNEL = True


# Corridor sort key (round 4): replace the key's direction bits with the
# Morton code of the point where the ray EXITS the scene bbox (one slab
# test per lane).  Two rays share a cull corridor iff they agree on BOTH
# endpoints; direction alone conflates short and long corridors.  The
# lane-level union simulator on real 100k bounce waves (cull_sim.py
# --simbin, chip dump 2026-08-19) measured per-512-lane-block unions of
# 75.0/102.6/95.9 tiles (bounces 1-3) under the origin×direction key vs
# 57.3/71.5/67.3 under origin×exit — a 0.70-0.76× cut, within ~1.3× of
# the nearest+farthest-needed-tile oracle.  Unlike the sub-beam split
# (measured worse, docs/ROUND4.md), a union cut at FIXED granularity
# reduces sweep invocations, not their width — no fixed-cost
# duplication.  False = the round-3 origin×direction code.
SORT_KEY_EXIT = True


def _ray_sort_key(scene: DeviceScene, state):
    """int32 sort key per lane: (dead, 6-D Morton of origin × corridor).

    Dead rays get the largest keys (they compact to the tail, forming
    all-dead lane blocks the trace/shade kernels skip).  Live rays sort by
    a SIX-dimensional Morton code — 5 bits per origin axis and 5 bits per
    second-endpoint axis, INTERLEAVED — so a lane block is compact at both
    corridor ends simultaneously: a narrow beam.  The second endpoint is
    the scene-bbox exit point (SORT_KEY_EXIT) or the direction octant
    (legacy).  History: the position-major key (morton then dir) made each
    512-lane block one origin cell spanning every direction — an
    omnidirectional shell whose per-block culls rejected little; the
    interleaved code measured 2.11 → 2.86 Mrays/s on the 100k bench
    (4+4 bits: 2.75); finer position-ONLY bits fragment blocks and
    measured worse both before and after the switch.
    """
    dead = (state[12] <= 0.0).astype(jnp.int32)
    bmin = scene.grid.bbox_min
    span = jnp.maximum(scene.grid.bbox_max - bmin, 1e-30)
    rel = (state[0:3] - bmin[:, None]) / span[:, None]
    q = jnp.clip(rel * 32.0, 0.0, 31.0).astype(jnp.int32)  # (3, R) 5b/axis
    if SORT_KEY_EXIT:
        o, d = state[0:3], state[3:6]
        inv = 1.0 / d  # ±inf on zero components; fmax/fmin eat the NaNs
        ta = (bmin[:, None] - o) * inv
        tb = (scene.grid.bbox_max[:, None] - o) * inv
        far = jnp.fmax(ta, tb)
        texit = jnp.maximum(jnp.minimum(jnp.minimum(far[0], far[1]), far[2]),
                            0.0)
        ex = (o + d * texit[None, :] - bmin[:, None]) / span[:, None]
        dq = jnp.clip(ex * 32.0, 0.0, 31.0).astype(jnp.int32)
    else:
        dq = jnp.clip((state[3:6] + 1.0) * 16.0, 0.0, 31.0).astype(jnp.int32)
    key = jnp.zeros_like(dead)
    for b in range(5):
        for a in range(3):
            key = key | (((q[a] >> b) & 1) << (6 * b + 2 * a))
            key = key | (((dq[a] >> b) & 1) << (6 * b + 2 * a + 1))
    return (dead << 30) | key


def _mid_sort_key(scene: DeviceScene, state):
    """int32 mid-resort key: (dead, first-3 needed box ids, corridor tail).

    Per lane, a slab test against every tile (or 8-tile group when the
    scene has more than NEEDSET_TILE_MAX tiles) orders the boxes the
    bounced ray can still reach by entry t; the first three ids — the
    lane's observed need signature — take the key's top bits so a lane
    block becomes rays that will sweep the SAME tiles, which is the
    quantity the per-block cull union actually measures.  Remaining low
    bits carry the corridor Morton code's top bits as a tiebreak.  Sim:
    cull_sim.py --simresort (see MID_SORT_NEEDSET).  Falls back to
    _ray_sort_key for non-MXU scenes.
    """
    if scene.mxu is None:
        return _ray_sort_key(scene, state)
    bb = scene.mxu.tile_bbox
    if bb.shape[1] > NEEDSET_TILE_MAX:
        bb = scene.mxu.group_bbox
    T = bb.shape[1]
    o, d = state[0:3], state[3:6]
    P = o.shape[1]
    tmin = jnp.full((T, P), -jnp.inf, jnp.float32)
    tmax = jnp.full((T, P), jnp.inf, jnp.float32)
    for a in range(3):
        inv = 1.0 / d[a]
        ta = (bb[a][:, None] - o[a][None, :]) * inv[None, :]
        tb = (bb[3 + a][:, None] - o[a][None, :]) * inv[None, :]
        tmin = jnp.maximum(tmin, jnp.fmin(ta, tb))
        tmax = jnp.minimum(tmax, jnp.fmax(ta, tb))
    ten = jnp.where((tmin <= tmax) & (tmax >= 0.0), tmin, jnp.inf)
    bits = max(int(math.ceil(math.log2(T + 1))), 1)
    k = min(3, 30 // bits)
    rows = jax.lax.iota(jnp.int32, T)[:, None]
    ids = []
    for j in range(k):
        i0 = jnp.argmin(ten, axis=0).astype(jnp.int32)
        got = jnp.min(ten, axis=0) < jnp.inf
        ids.append(jnp.where(got, i0, T))
        if j + 1 < k:
            ten = jnp.where(rows == i0[None, :], jnp.inf, ten)
    base = _ray_sort_key(scene, state)
    mix = base & ((1 << 30) - 1)
    dead = base >> 30  # 0 live / 1 dead (int32 bit 30; sign bit untouched)
    kk = jnp.zeros_like(mix)
    for idv in ids:
        kk = (kk << bits) | idv
    tail = 30 - k * bits
    return (dead << 30) | (kk << tail) | (mix >> (30 - tail))


def _sort_state_payload(key, state, extra=()):
    """Sort ray-state columns by ``key``, ties broken by original lane
    index — the EXACT order of the stable ``jnp.argsort(key)`` it
    replaces — carrying the state rows as ``lax.sort`` PAYLOAD operands
    instead of gathering by the permutation afterwards.

    Payload movement rides the sort network's sequential compare-exchange
    passes; an axis-1 gather of a field-major (16, R) array runs at
    ~2.7 GB/s effective on v5e (the TPU has no gather unit).  Measured
    (scripts/micro_sort.py, chip 2026-08-19, R=2^19): argsort + takes +
    invert-perm + unsort-take = 16.4 ms/op; the payload form = 3.2 ms/op
    (5.1×).  The (key, iota) num_keys=2 composite is unique, so the
    result is deterministic under ``is_stable=False`` and bit-identical
    to the gather composition.

    Returns (perm, sorted_state, sorted_extras) — ``perm`` is the sorted
    iota (identical to ``jnp.argsort(key)``), reusable as the unique
    unsort key for :func:`_unsort_rows`."""
    r = key.shape[0]
    n = state.shape[0]
    iota = jax.lax.iota(jnp.int32, r)
    ops = jax.lax.sort(
        (key, iota) + tuple(state[i] for i in range(n)) + tuple(extra),
        dimension=0, num_keys=2, is_stable=False,
    )
    return ops[1], jnp.stack(ops[2 : 2 + n]), ops[2 + n :]


def _unsort_rows(perm, rows):
    """Restore wave order for ``rows`` ((k, R), sorted lane order) where
    ``perm`` holds each lane's original position: one num_keys=1 sort on
    the unique perm column (the payload twin of take-by-inverse-perm;
    see _sort_state_payload for the measurements)."""
    n = rows.shape[0]
    back = jax.lax.sort(
        (perm,) + tuple(rows[i] for i in range(n)),
        dimension=0, num_keys=1, is_stable=False,
    )
    return jnp.stack(back[1:])


def _finish_path_sorted(scene, bank, state, idx0, max_bounce: int,
                        ed: bool, interpret: bool, key0=None):
    """Whole-path continuation after bounce 0: beam-sort/compact the wave,
    trace the remaining bounces in one or more whole-path kernel calls
    (resorting again after each bounce in MID_RESORT_BOUNCES), and unsort.

    ``state`` is the (16, R) state after bounce 0; ``idx0`` the bounce-0
    winner (1, R) int32 (or None when EXCLUDE_PREV_HIT is off); ``key0``
    the kernel-emitted bounce-0 sort key (bitcast state row 15), computed
    via the host key when None.  Mid-path keys always come from the host
    key (_ray_sort_key) — pinned bit-identical to the kernel key by
    tests/test_fused.py::test_emit_sort_key_matches_host_key.

    Returns rows4 (4, R) in ORIGINAL wave-lane order: radiance rows 9-11
    + the segment counter row 14."""
    from .fused import path_trace_fused

    emit_idx = idx0 is not None
    # Resort boundaries: the path [1, max_bounce) splits after each bounce
    # r in MID_RESORT_BOUNCES (resorting after the final bounce is dead
    # weight — nothing traces afterwards).
    bounds = [1] + sorted(
        {r + 1 for r in MID_RESORT_BOUNCES if 1 <= r <= max_bounce - 2}
    ) + [max_bounce]
    R = state.shape[1]
    order = None  # running map: current lane -> original wave position
    idx_cur = idx0[0] if emit_idx else None
    for i in range(len(bounds) - 1):
        b_start, b_end = bounds[i], bounds[i + 1]
        # Mid-path resorts (i > 0) may sort only the live-region prefix
        # (see MID_RESORT_PREFIX); the bounce-0 sort is always full-wave.
        P = R
        if i > 0 and MID_RESORT_PREFIX > 1:
            P = max(1024, R // MID_RESORT_PREFIX // 1024 * 1024)
        mid_key = _mid_sort_key if MID_SORT_NEEDSET else _ray_sort_key
        if P < R:
            key = mid_key(scene, state[:, :P])
            extra = (() if idx_cur is None else (idx_cur[:P],)) + (order[:P],)
            _, sp, extras_p = _sort_state_payload(key, state[:, :P], extra)
            state = jnp.concatenate([sp, state[:, P:]], axis=1)
            ei = 0
            if idx_cur is not None:
                idx_cur = jnp.concatenate([extras_p[0], idx_cur[P:]])
                ei = 1
            order = jnp.concatenate([extras_p[ei], order[P:]])
        else:
            key = (
                key0
                if i == 0 and key0 is not None
                else (_ray_sort_key if i == 0 else mid_key)(scene, state)
            )
            extra = () if idx_cur is None else (idx_cur,)
            if order is not None:
                extra = extra + (order,)
            perm, state, extras = _sort_state_payload(key, state, extra)
            ei = 0
            if idx_cur is not None:
                idx_cur = extras[0]
                ei = 1
            order = perm if order is None else extras[ei]
        last = i == len(bounds) - 2
        out = path_trace_fused(
            scene.mxu, state, scene.shade_table_t, bank,
            b_end - b_start, ed, interpret=interpret, bounce0=b_start,
            prev=idx_cur, emit_idx=emit_idx and not last,
        )
        if emit_idx and not last:
            state, idxo = out
            idx_cur = idxo[0]
        else:
            state = out
    return _unsort_rows(
        order, jnp.concatenate([state[9:12], state[14:15]], axis=0)
    )


class TraceResult(NamedTuple):
    t: jnp.ndarray  # (R,) f32 — +inf on miss
    u: jnp.ndarray  # (R,) f32
    v: jnp.ndarray  # (R,) f32
    dup_idx: jnp.ndarray  # (R,) int32 — index into duplicated tri arrays


def trace_any(scene: DeviceScene, orig, direction, active, exclude=None):
    """Backend dispatch: returns (t, u, v, unique_tri_idx).

    MXU brute force when the scene baked transforms (scene.mxu), else the
    grid/gather wavefront.  Both implement the same hit rule; visibility is
    identical by construction (the grid only prunes work, never hits).

    ``exclude``: optional (R,) int32 unique-space previous-hit triangle
    each ray may not re-hit (ops.mxu_intersect.EXCLUDE_PREV_HIT).
    """
    if scene.mxu is not None:
        from ..ops.mxu_intersect import nearest_hit_mxu

        t, u, v, idx = nearest_hit_mxu(scene.mxu, orig, direction, active,
                                       exclude=exclude)
        return t, u, v, idx
    hit = trace_wave(scene, orig, direction, active, exclude=exclude)
    return hit.t, hit.u, hit.v, scene.dup_to_tri[hit.dup_idx]


def trace_wave(scene: DeviceScene, orig, direction, active,
               exclude=None) -> TraceResult:
    """Nearest-hit for a wave of rays via grid DDA + Möller–Trumbore.

    Reference: Scene.traceRay (src/stage3.zig:152-186).  ``active=False``
    rays return a miss without touching memory bandwidth beyond lock-step.
    ``exclude`` is in UNIQUE triangle space (the grid's candidates are
    duplicated per cell, so each is mapped through dup_to_tri to compare).
    """
    entered, state = dda.dda_setup(scene.grid, orig, direction)

    cell_lin = dda.linearize_cell_idx(scene.grid, state.cell)
    cell_lin = jnp.clip(cell_lin, 0, scene.cell_begin.shape[0] - 1)
    cursor = jnp.where(entered, scene.cell_begin[cell_lin], 0)
    cur_end = jnp.where(entered, scene.cell_end[cell_lin], 0)

    nearest_t = jnp.full(orig.shape[:-1], INF, jnp.float32)
    nearest_u = jnp.zeros_like(nearest_t)
    nearest_v = jnp.zeros_like(nearest_t)
    nearest_i = jnp.zeros_like(cursor)
    done = ~(entered & active)

    def cond(carry):
        done = carry[0]
        return ~jnp.all(done)

    def body(carry):
        (done, state, cursor, cur_end, nearest_t, nearest_u, nearest_v, nearest_i) = carry
        alive = ~done

        # --- triangle phase: up to TRI_BATCH MT tests against current cell
        for _ in range(TRI_BATCH):
            has_tri = alive & (cursor < cur_end)
            idx = jnp.where(has_tri, cursor, 0)
            valid, t, u, v = linalg.moller_trumbore(
                orig, direction, scene.tri_v0[idx], scene.tri_e1[idx], scene.tri_e2[idx]
            )
            better = has_tri & valid & (t > 0.0) & (t < nearest_t)
            if exclude is not None:
                better = better & (scene.dup_to_tri[idx] != exclude)
            nearest_t = jnp.where(better, t, nearest_t)
            nearest_u = jnp.where(better, u, nearest_u)
            nearest_v = jnp.where(better, v, nearest_v)
            nearest_i = jnp.where(better, idx, nearest_i)
            cursor = cursor + has_tri.astype(jnp.int32)

        # --- cell-advance phase: rays whose cell is exhausted step the DDA
        need_advance = alive & (cursor >= cur_end)
        t_cross, state = dda.dda_next(state, active=need_advance)
        # Early exit: hit settled before the next cell boundary, or grid
        # exit (t_cross = inf; inf <= inf also terminates, matching Zig).
        newly_done = need_advance & (nearest_t <= t_cross)
        done = done | newly_done

        moved = need_advance & ~newly_done
        cell_lin = dda.linearize_cell_idx(scene.grid, state.cell)
        cell_lin = jnp.clip(cell_lin, 0, scene.cell_begin.shape[0] - 1)
        cursor = jnp.where(moved, scene.cell_begin[cell_lin], cursor)
        cur_end = jnp.where(moved, scene.cell_end[cell_lin], cur_end)

        return (done, state, cursor, cur_end, nearest_t, nearest_u, nearest_v, nearest_i)

    carry = (done, state, cursor, cur_end, nearest_t, nearest_u, nearest_v, nearest_i)
    carry = jax.lax.while_loop(cond, body, carry)
    (_, _, _, _, nearest_t, nearest_u, nearest_v, nearest_i) = carry
    return TraceResult(nearest_t, nearest_u, nearest_v, nearest_i)


def _interpolate(per_vertex, u, v):
    """Barycentric interpolation: v0*(1-u-v) + v1*u + v2*v.

    (src/stage3.zig:53-71 — Triangle.Data.interpolate).
    per_vertex: (R, 3, C); u, v: (R,).
    """
    w0 = (1.0 - u - v)[:, None]
    return per_vertex[:, 0] * w0 + per_vertex[:, 1] * u[:, None] + per_vertex[:, 2] * v[:, None]


def _exact_divmod_f32(g, d: int):
    """(g // d, g % d) for 0 <= g < 2^23 via exact f32 math — no int div.

    f32 represents every int < 2^24; a reciprocal-multiply can be off by one
    at boundaries, fixed with compares.  (TPU int div is ~250× slower.)
    """
    gf = g.astype(jnp.float32)
    q = jnp.floor(gf * jnp.float32(1.0 / d))
    q = jnp.where(q * d > gf, q - 1.0, q)
    q = jnp.where((q + 1.0) * d <= gf, q + 1.0, q)
    return q, gf - q * d


def wave_pixel_coords(local, spp, width: int, pix_base):
    """(pixel int32, x f32, y f32) for wave-local ray ids.

    ``pix_base`` (scalar int32, the wave's first pixel id) is split exactly
    with ONE scalar integer divmod; the per-ray offsets — bounded by
    wave_size/spp + width < 2^23 — use exact f32 math (hot int div is ~250×
    slower on the VPU).  Exact for any pix_base < 2^31, i.e. images far past
    4K and device tiles whose base exceeds f32's 2^24 integer range.
    Pixel x/y follow the reference's row-major convention
    (src/stage3.zig:234-235).
    """
    pix_base = jnp.asarray(pix_base, jnp.int32)
    y_base = pix_base // width  # scalar, once per wave
    x_base = pix_base - y_base * width
    lp_f, _ = _exact_divmod_f32(local, spp)
    pixel = pix_base + lp_f.astype(jnp.int32)
    row_off = x_base.astype(jnp.float32) + lp_f
    dy, x = _exact_divmod_f32(row_off, width)
    y = y_base.astype(jnp.float32) + dy
    return pixel, x, y


def shade_and_scatter(scene: DeviceScene, orig, direction, t, u, v, tri, streams, bounce: int):
    """One shading round: texture fetch, alpha test, diffuse scatter.

    ``tri`` indexes the unique triangle attribute arrays.  Returns
    (new_orig, new_dir, emissive_term, albedo_term, opacity_pass, missed) —
    all gated downstream by the caller's alive mask.
    Reference: traceRayRecursive body (src/stage3.zig:188-220).
    """
    missed = t == INF

    # ONE fat gather per ray: normals + uvs + both texture descriptors
    # (scene/types.py shade_table layout).
    from ..scene.types import COL_BASE_DESC, COL_EMIS_DESC

    rec = scene.shade_table[tri]  # (R, 32)
    tri_nrm = rec[:, 0:9].reshape(-1, 3, 3)
    tri_uv = rec[:, 9:15].reshape(-1, 3, 2)
    base_desc = rec[:, COL_BASE_DESC : COL_BASE_DESC + 7]
    emis_desc = rec[:, COL_EMIS_DESC : COL_EMIS_DESC + 7]

    texcoord = _interpolate(tri_uv, u, v)
    tc_u, tc_v = texcoord[:, 0], texcoord[:, 1]
    base = sample_texture(scene.color_data, base_desc, tc_u, tc_v)  # (R, 4)
    albedo = base[:, :3]
    opacity = base[:, 3]  # reference's "transparency" texture == base alpha
    emissive = sample_texture(scene.color_data, emis_desc, tc_u, tc_v)[:, :3]
    normal = _interpolate(tri_nrm, u, v)

    # Stochastic alpha: rand > opacity → continue straight through
    # (src/stage3.zig:207-213).  Both branches consume a bounce.
    rnd = rng.uniform(streams, 2 * bounce + 1)
    pass_through = rnd > opacity

    # Diffuse bounce: dir = normalize(normal + randomUnitVector)
    # (src/stage3.zig:214-217; Gaussian sphere sampling src/linalg.zig:140-148).
    gauss = rng.normal3(streams, 2 * bounce + 2)
    scattered = linalg.normalize(normal + linalg.normalize(gauss))

    new_orig = linalg.ray_at(orig, direction, t + FLT_EPSILON)
    new_dir = jnp.where(pass_through[:, None], direction, scattered)

    return new_orig, new_dir, emissive, albedo, pass_through, missed, normal


def render_wave(
    scene: DeviceScene,
    cam_origin,
    cam_lower_left,
    cam_right,
    cam_up,
    width: int,
    spp: int,
    max_bounce: int,
    g_start,
    wave_size: int,
    base_key,
    pix_base=None,
    use_fused: bool | None = None,
    ext=None,
):
    """Path-trace one wave of global ray ids [g_start, g_start + wave_size).

    Global ray id g ↔ (pixel = g // spp, sample = g % spp); pixel x/y from
    the row-major index like the reference (src/stage3.zig:234-235).
    ``pix_base`` is the exact int32 pixel id of the wave's first ray
    (= g_start // spp; waves are pixel-aligned).  It is a separate argument
    because g_start need not be f32-representable (sharded tiles of large
    images exceed 2^24), while int32 is exact to 2^31 rays.  Defaults to
    g_start // spp (one scalar int div per wave — cold).
    Returns (pixel_ids (R,), radiance (R, 3), segments (R,) int32) where
    segments counts traced path segments for the Mrays/s metric.
    """
    R = wave_size
    local = jnp.arange(R, dtype=jnp.int32)
    g = g_start + local
    streams = rng.ray_streams(base_key, g)

    if pix_base is None:
        pix_base = g_start // spp
    pixel, x, y = wave_pixel_coords(local, spp, width, pix_base)

    jx, jy = rng.uniform2_soa(streams, 0)
    sx = x + jx
    sy = y + jy

    # use_fused=None → auto: the fused Pallas pipeline on TPU, XLA shading
    # elsewhere.  An explicit True forces the fused kernels (interpret mode
    # off-TPU) so CPU tests can pin the exact production composition,
    # including under shard_map.
    ext_any = ext is not None and ext.any
    if ext_any:
        # Extensions run on the XLA shading path (reference semantics stay
        # untouched in the fused kernels).
        if use_fused:
            raise ValueError("rendering extensions require the XLA path")
        use_fused = False
    if use_fused is None:
        use_fused = scene.mxu is not None and jax.default_backend() == "tpu"
    if use_fused:
        if scene.mxu is None:
            raise ValueError("use_fused requires an MXU-baked scene")
        # Fully fused bounce (ops/mxu_intersect.trace_emit_aux +
        # render/fused.shade_fused): ray state is ONE field-major (16, R)
        # tensor flowing kernel-to-kernel; per bounce only the record and
        # texel gathers run in XLA.  Ray gen is ROW-WISE (same per-element
        # float ops as Camera.getRay, src/stage3.zig:27-35) so no AoS
        # buffers or transposes ever materialize.
        from .fused import shade_fused
        from ..ops.mxu_intersect import trace_emit_aux

        interpret = jax.default_backend() != "tpu"

        dr = [
            cam_lower_left[a] + cam_right[a] * sx + cam_up[a] * sy
            for a in range(3)
        ]
        inv_len = 1.0 / jnp.sqrt(dr[0] * dr[0] + dr[1] * dr[1] + dr[2] * dr[2])
        ones = jnp.ones((R,), jnp.float32)
        zeros = jnp.zeros((R,), jnp.float32)
        state = jnp.stack(
            [
                cam_origin[0] * ones,
                cam_origin[1] * ones,
                cam_origin[2] * ones,
                dr[0] * inv_len,
                dr[1] * inv_len,
                dr[2] * inv_len,
                ones, ones, ones,  # throughput
                zeros, zeros, zeros,  # radiance
                ones,  # alive
                jax.lax.bitcast_convert_type(streams, jnp.float32),
                zeros, zeros,  # segments, pad
            ],
            axis=0,
        )
        sort_rays = scene.mxu.tri_data.shape[1] > SORT_MIN_TRIS
        from ..ops.mxu_intersect import REC_EMIT_MAX_TRIS
        from .fused import resident_bank

        bank = resident_bank(scene)
        if (
            # (implied by the REC_EMIT bound — REC_EMIT_MAX_TRIS <
            # SORT_MIN_TRIS — but kept explicit: the path kernel has no
            # between-bounce resort, so it must never take sorted scenes)
            not sort_rays
            and bank is not None
            and scene.shade_table_t is not None
            and scene.mxu.tri_data.shape[1] <= REC_EMIT_MAX_TRIS
        ):
            # Whole-path kernel: every bounce's trace + shade in ONE Pallas
            # call (fused.path_trace_fused) — the fully-VMEM-resident
            # regime.  Saves ~2·max_bounce grid-step taxes per block and
            # skips whole bounces for blocks that go all-dead.
            #
            # The path is split at bounce 0: primaries run raster-ordered
            # (already coherent), then ONE (dead, 6-D Morton) sort compacts
            # dead rays into kernel-skipped blocks and tightens live
            # blocks into beams for the remaining bounces (payload sort:
            # see _sort_state_payload) — on the official scene 87% of
            # rays die after bounce 0 but stay scattered without this.
            from .fused import path_trace_fused

            ed = scene.emissive_all_dummy is not None
            if max_bounce <= 1 or not SORT_AFTER_BOUNCE0:
                state = path_trace_fused(
                    scene.mxu, state, scene.shade_table_t,
                    bank, max_bounce, ed, interpret=interpret,
                )
                return pixel, state[9:12].T, state[14].astype(jnp.int32)
            from ..ops.mxu_intersect import EXCLUDE_PREV_HIT

            out = path_trace_fused(
                scene.mxu, state, scene.shade_table_t, bank,
                1, ed, interpret=interpret, emit_idx=EXCLUDE_PREV_HIT,
            )
            state, idx0 = out if EXCLUDE_PREV_HIT else (out, None)
            rows4 = _finish_path_sorted(
                scene, bank, state, idx0, max_bounce, ed, interpret
            )
            return pixel, rows4[0:3].T, rows4[3].astype(jnp.int32)

        # Bounce-ray reordering: bounce rays scatter in direction and origin,
        # which defeats the trace kernel's per-block tile culls.  For scenes
        # big enough that traversal dominates (the HBM-streaming regime),
        # sort the ray state between bounces by (dead, direction octant,
        # coarse Morton cell of the origin): dead rays pack into all-dead
        # lane blocks the kernels skip outright (compaction), and live
        # blocks become spatially coherent so group/tile culls bite.  The
        # sort costs one 18-operand payload sort per bounce (see
        # _sort_state_payload) — profitable only when a bounce's trace
        # costs much more (gated by sort_rays; see SORT_MIN_TRIS).
        order = local  # running map: lane -> original wave position
        from ..ops.mxu_intersect import EXCLUDE_PREV_HIT

        prev_m = None  # previous bounce's winner (Morton space)
        for bounce in range(max_bounce):
            # Sort EVERY bounce including primaries: isolated bounce-0 trace
            # barely improves (60→57 ms for a 28 ms sort), but the spatial
            # order it establishes keeps bounce 1+ coherent — measured 1.45
            # vs 1.16 Mrays/s end-to-end on the 100k scene.
            if sort_rays:
                key = (
                    _mid_sort_key
                    if MID_SORT_NEEDSET and bounce > 0
                    else _ray_sort_key
                )(scene, state)
                extra = (order,) + ((prev_m,) if prev_m is not None else ())
                _, state, extras = _sort_state_payload(key, state, extra)
                order = extras[0]
                if prev_m is not None:
                    prev_m = extras[1]
            # Every MXU regime now emits the winner's shade record and
            # exact u/v from inside the trace kernel (one-hot MXU dot per
            # winner tile; HBM table/bank slices DMA'd on demand), so
            # shade_fused never pays the (24, R) record gather and the
            # (13, R) u/v recompute gather is gone.
            from .fused import SHARED_ORIGIN_B0

            # Bounce 0: every lane's origin IS the camera origin (set
            # above), so the kernels run origin transforms + slab-cull
            # subtractions on scalars — bit-identical, fewer vector ops.
            origin = (
                cam_origin if bounce == 0 and SHARED_ORIGIN_B0 else None
            )
            from ..ops.mxu_intersect import VMEM_RESIDENT_MAX_TRIS

            emit_table = scene.shade_table_t
            if (
                not STREAM_REC_IN_KERNEL
                and scene.mxu.tri_data.shape[1] > VMEM_RESIDENT_MAX_TRIS
            ):
                emit_table = None  # A/B: XLA gather + recompute_uv instead
            aux, tri, rec = trace_emit_aux(
                scene.mxu, state, rec_table=emit_table,
                interpret=interpret, origin=origin,
                prev=prev_m if EXCLUDE_PREV_HIT else None,
            )
            prev_m = tri  # winner per lane; dead lanes never consume it
            state = shade_fused(
                scene, state, aux, tri, bounce,
                interpret=interpret, block_skip=sort_rays, rec=rec,
            )
        if sort_rays:
            # ``order`` maps sorted lane -> original wave position and is a
            # permutation of [0, R): it IS the unique unsort key.
            rows4 = _unsort_rows(
                order,
                jnp.concatenate([state[9:12], state[14:15]], axis=0),
            )
            return pixel, rows4[0:3].T, rows4[3].astype(jnp.int32)
        return pixel, state[9:12].T, state[14].astype(jnp.int32)

    # XLA shading path: AoS (R, 3) ray buffers (measured best off-TPU).
    direction = linalg.normalize(
        cam_lower_left + cam_right * sx[:, None] + cam_up * sy[:, None]
    )
    orig = jnp.broadcast_to(cam_origin, direction.shape)
    alive = jnp.ones(R, dtype=bool)
    segments = jnp.zeros(R, dtype=jnp.int32)
    radiance = jnp.zeros_like(direction)
    throughput = jnp.ones_like(direction)
    # NEE bookkeeping: emissive hit radiance counts only when the previous
    # segment was NOT already direct-sampled (extensions.py docstring).
    count_emissive = jnp.ones(R, dtype=bool)
    use_nee = ext_any and ext.nee and scene.lights is not None
    from ..ops.mxu_intersect import EXCLUDE_PREV_HIT

    prev_u = None  # previous bounce's hit (unique triangle space)
    for bounce in range(max_bounce):
        if ext_any and ext.russian_roulette:
            from .extensions import roulette

            throughput, alive = roulette(throughput, streams, bounce, alive)
        segments = segments + alive.astype(jnp.int32)
        t, u, v, tri = trace_any(
            scene, orig, direction, alive,
            exclude=prev_u if EXCLUDE_PREV_HIT else None,
        )
        prev_u = tri  # dead/missed lanes never consume their value
        (new_orig, new_dir, emissive, albedo, pass_through, missed, normal
         ) = shade_and_scatter(
            scene, orig, direction, t, u, v, tri, streams, bounce
        )

        add_env = alive & missed
        radiance = radiance + jnp.where(
            add_env[:, None], throughput * linalg.env_color(direction), 0.0
        )

        shaded = alive & ~missed & ~pass_through
        add_emis = shaded & count_emissive if use_nee else shaded
        radiance = radiance + jnp.where(add_emis[:, None], throughput * emissive, 0.0)

        take_spec = None
        if ext_any and ext.pbr and scene.ext_mr is not None:
            from .extensions import pbr_scatter

            spec_or_diff, take_spec = pbr_scatter(
                scene, tri, direction, normal, new_dir, streams, bounce
            )
            new_dir = jnp.where(pass_through[:, None], direction, spec_or_diff)

        if use_nee:
            from .extensions import sample_direct_light

            nee_lanes = shaded if take_spec is None else (shaded & ~take_spec)
            radiance = radiance + sample_direct_light(
                scene, new_orig, normal, albedo, throughput, streams, bounce,
                nee_lanes,
            )
            # Next hit's emissive is double-counted only for NEE'd lanes.
            count_emissive = jnp.where(shaded, ~nee_lanes, count_emissive)

        throughput = jnp.where(shaded[:, None], throughput * albedo, throughput)

        stepped = alive & ~missed
        orig = jnp.where(stepped[:, None], new_orig, orig)
        direction = jnp.where(stepped[:, None], new_dir, direction)
        alive = stepped
        # Rays alive after the last bounce contribute nothing — depth
        # exhaustion returns black (src/stage3.zig:189-191).

    return pixel, radiance, segments


def whole_path_regime(scene: DeviceScene, use_fused: bool | None = None,
                      ext=None) -> bool:
    """True when the wave renders via the whole-path kernel regime (fused
    v2: in-kernel ray gen + all bounces in one or two Pallas calls).  The
    pipeline uses this to pick the slot geometry (tiled pixel order) and
    framebuffer layout up front."""
    from ..ops.mxu_intersect import REC_EMIT_MAX_TRIS

    if ext is not None and ext.any:
        return False
    from .fused import resident_bank

    if use_fused is None:
        use_fused = scene.mxu is not None and jax.default_backend() == "tpu"
    # Any single-kernel bank qualifies: one-hot, VMEM-paged, or HBM-paged
    # (demanded pages DMA-streamed in-kernel); only scenes past
    # PAGED_MAX_TEXELS fall to the per-bounce XLA-gather pipeline.
    return bool(
        use_fused
        and scene.mxu is not None
        and resident_bank(scene) is not None
        and scene.shade_table_t is not None
        and scene.mxu.tri_data.shape[1] <= REC_EMIT_MAX_TRIS
        and scene.mxu.tri_data.shape[1] <= SORT_MIN_TRIS
    )


def build_gen_par(scene: DeviceScene, cam_origin, cam_lower_left, cam_right,
                  cam_up):
    """(32,) f32 scalar bank for the in-kernel ray generator (fused.PAR_*
    rows): camera basis + scene bbox quantization for the beam-sort key.
    Built inside jit — one tiny concat per device call."""
    span = jnp.maximum(scene.grid.bbox_max - scene.grid.bbox_min, 1e-30)
    return jnp.concatenate(
        [
            cam_origin, cam_lower_left, cam_right, cam_up,
            scene.grid.bbox_min, 32.0 / span,
            jnp.zeros((14,), jnp.float32),
        ]
    )


def render_wave_rows(
    scene: DeviceScene,
    par,  # (32,) f32 from build_gen_par
    width: int,
    height: int,
    spp: int,
    max_bounce: int,
    slot_base,  # traced int32: first pixel SLOT of this wave
    slot_cap,  # traced int32: rows at slots >= cap are zeroed (device tile
    #            bound / image bound in raster order)
    wave_size: int,
    base_key,
    tiles_x: int,  # 0 = raster slot order; else 32×32-pixel tiled order
    use_fused: bool | None = None,
    ext=None,
):
    """Field-major wave contract: returns (rows3 (3, R) radiance in WAVE
    SLOT ORDER, segments int32 scalar).  Rays outside the image or past
    ``slot_cap`` contribute exact zeros, so accumulation is maskless:
    reshape (3, wp, spp) → sum → one dynamic_update_slice.

    Whole-path regime: ray gen happens inside the Pallas kernel
    (fused.path_trace_gen) — the wave's XLA footprint is one payload
    sort + one payload unsort (see _sort_state_payload).  Other regimes
    delegate to render_wave and transpose."""
    R = wave_size
    ext_any = ext is not None and ext.any
    if use_fused is None:
        use_fused = scene.mxu is not None and jax.default_backend() == "tpu"
    slot_lane = slot_base + jnp.asarray(np.arange(R) // spp, jnp.int32)
    mask = slot_lane < slot_cap

    if whole_path_regime(scene, use_fused, ext):
        from .fused import GenParams, path_trace_gen, resident_bank

        bank = resident_bank(scene)

        interpret = jax.default_backend() != "tpu"
        gen = GenParams(
            spp=spp, width=width, img_w=width, img_h=height, tiles_x=tiles_x
        )
        sb = jnp.asarray(slot_base, jnp.int32)
        y_base = sb // width  # scalar, once per wave
        x_base = sb - y_base * width
        tile_base = sb // 1024  # tiled waves are tile-aligned
        zero = jnp.int32(0)
        meta = jnp.stack(
            [
                sb, x_base, y_base,
                jnp.asarray(base_key).astype(jnp.int32),
                tile_base, zero, zero, zero,
            ]
        )
        ed = scene.emissive_all_dummy is not None
        do_sort = SORT_AFTER_BOUNCE0 and max_bounce > 1
        from ..ops.mxu_intersect import EXCLUDE_PREV_HIT

        emit_idx = do_sort and EXCLUDE_PREV_HIT
        out = path_trace_gen(
            scene.mxu, par, meta, scene.shade_table_t, bank,
            R, 1 if do_sort else max_bounce, ed, gen,
            emit_key=do_sort, emit_idx=emit_idx, interpret=interpret,
        )
        state, idx0 = out if emit_idx else (out, None)
        if do_sort:
            key = jax.lax.bitcast_convert_type(state[15], jnp.int32)
            rows4 = _finish_path_sorted(
                scene, bank, state, idx0, max_bounce, ed, interpret,
                key0=key,
            )
        else:
            rows4 = jnp.concatenate([state[9:12], state[14:15]], axis=0)
        rows3 = jnp.where(mask[None, :], rows4[0:3], 0.0)
        segs = jnp.sum(
            jnp.where(mask, rows4[3], 0.0).astype(jnp.int32), dtype=jnp.int32
        )
        return rows3, segs

    # Fallback: raster slot order == pixel ids (XLA path, per-bounce fused
    # pipeline, extensions).  slot_cap doubles as the image bound.
    assert tiles_x == 0, "tiled slot order requires the whole-path regime"
    pixel, radiance, segments = render_wave(
        scene,
        par[0:3], par[3:6], par[6:9], par[9:12],
        width, spp, max_bounce,
        slot_base * spp, R, base_key,
        pix_base=slot_base, use_fused=use_fused, ext=ext,
    )
    rows3 = jnp.where(mask[None, :], radiance.T, 0.0)
    segs = jnp.sum(jnp.where(mask, segments, 0), dtype=jnp.int32)
    return rows3, segs


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "spp", "max_bounce", "wave_size", "num_slots",
        "num_waves", "tiles_x", "use_fused", "ext",
    ),
    donate_argnames=("fb",),
)
def render_frame_chunk_rows(
    scene: DeviceScene,
    fb,  # (3, S) field-major framebuffer (slot-major, padded to waves)
    cam_origin,
    cam_lower_left,
    cam_right,
    cam_up,
    base_key,
    width: int,
    height: int,
    spp: int,
    max_bounce: int,
    wave_size: int,
    num_slots: int,
    num_waves: int,
    start_wave,
    tiles_x: int,
    use_fused: bool | None = None,
    ext=None,
):
    """``num_waves`` field-major waves in ONE device call (fori_loop)."""
    return _render_chunk_body(
        scene, fb, cam_origin, cam_lower_left, cam_right, cam_up, base_key,
        jnp.int32(0), width, height, spp, max_bounce, wave_size, num_slots,
        num_waves, start_wave, tiles_x, use_fused, ext,
    )


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "spp", "max_bounce", "wave_size", "num_slots",
        "num_waves", "tiles_x", "use_fused", "ext",
    ),
    donate_argnames=("fb",),
)
def render_frame_chunk_emit(
    scene: DeviceScene,
    fb,  # (3, S) field-major framebuffer (slot-major, padded to waves)
    cam_origin,
    cam_lower_left,
    cam_right,
    cam_up,
    base_key,
    seg_in,  # int32 running segment total (threaded through chunks)
    width: int,
    height: int,
    spp: int,
    max_bounce: int,
    wave_size: int,
    num_slots: int,
    num_waves: int,
    start_wave,
    tiles_x: int,
    use_fused: bool | None = None,
    ext=None,
):
    """``num_waves`` waves in one device call, PLUS the chunk's finished
    pixels gamma-encoded for streaming device→host transfer.

    The axon-tunneled v5e pays ~26 ms latency + ~66 MB/s for device→host
    reads, so fetching the full 1080p image after the last wave costs
    ~180-280 ms of pure tail (measured round 3).  Each wave owns a disjoint
    slot range, so a chunk's slots are FINAL when it returns: encode them
    to u8 here and let the caller ``copy_to_host_async`` the slice while
    later chunks compute — the transfer rides under device compute and
    only the last (smallest) chunk's bytes remain exposed.

    Returns (fb, enc, seg_out): ``enc`` is the chunk's slots as flat u8
    RGB (slot order) with the RUNNING segment total appended as 4 bytes
    (little-endian int32) — reading the last chunk's tail gives the frame
    total without a separate ~28 ms scalar round trip.
    """
    wp = wave_size // spp
    fb, segs = _render_chunk_body(
        scene, fb, cam_origin, cam_lower_left, cam_right, cam_up, base_key,
        seg_in, width, height, spp, max_bounce, wave_size, num_slots,
        num_waves, start_wave, tiles_x, use_fused, ext,
    )
    s0 = (start_wave * wp).astype(jnp.int32)
    sl = jax.lax.dynamic_slice(fb, (0, s0), (3, num_waves * wp))
    enc = linalg.vec3_to_rgb(sl.T / spp).reshape(-1)
    seg_bytes = jax.lax.bitcast_convert_type(segs, jnp.uint8)
    return fb, jnp.concatenate([enc, seg_bytes]), segs


def _render_chunk_body(
    scene, fb, cam_origin, cam_lower_left, cam_right, cam_up, base_key,
    seg_in, width, height, spp, max_bounce, wave_size, num_slots, num_waves,
    start_wave, tiles_x, use_fused, ext,
):
    wp = wave_size // spp
    par = build_gen_par(scene, cam_origin, cam_lower_left, cam_right, cam_up)

    def body(wv, carry):
        fb, segs = carry
        wave = start_wave + wv
        slot_base = (wave * wp).astype(jnp.int32)
        rows3, wave_segs = render_wave_rows(
            scene, par, width, height, spp, max_bounce,
            slot_base, jnp.int32(num_slots), wave_size, base_key, tiles_x,
            use_fused, ext,
        )
        sums = rows3.reshape(3, wp, spp).sum(axis=2)
        cur = jax.lax.dynamic_slice(fb, (0, slot_base), (3, wp))
        fb = jax.lax.dynamic_update_slice(fb, cur + sums, (0, slot_base))
        return fb, segs + wave_segs

    return jax.lax.fori_loop(0, num_waves, body, (fb, seg_in))


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "spp", "max_bounce", "wave_size", "num_slots",
        "tiles_x", "use_fused", "ext",
    ),
    donate_argnames=("fb",),
)
def render_wave_accumulate_rows(
    scene: DeviceScene,
    fb,
    cam_origin,
    cam_lower_left,
    cam_right,
    cam_up,
    base_key,
    wave,
    width: int,
    height: int,
    spp: int,
    max_bounce: int,
    wave_size: int,
    num_slots: int,
    tiles_x: int,
    use_fused: bool | None = None,
    ext=None,
):
    """Single-wave rows render + accumulate (progressive dumps)."""
    wp = wave_size // spp
    par = build_gen_par(scene, cam_origin, cam_lower_left, cam_right, cam_up)
    slot_base = (wave * wp).astype(jnp.int32)
    rows3, segs = render_wave_rows(
        scene, par, width, height, spp, max_bounce, slot_base,
        jnp.int32(num_slots), wave_size, base_key, tiles_x, use_fused, ext,
    )
    sums = rows3.reshape(3, wp, spp).sum(axis=2)
    cur = jax.lax.dynamic_slice(fb, (0, slot_base), (3, wp))
    fb = jax.lax.dynamic_update_slice(fb, cur + sums, (0, slot_base))
    return fb, segs


def accumulate_wave(framebuffer, pixel, radiance, segments, pix_base, spp, num_pixels):
    """Regular-pattern accumulation: NO scatter (TPU scatters serialize).

    Waves are spp-aligned, so each pixel's spp samples are contiguous in
    the global ray order: reshape-(wp, spp, 3)-sum, then one contiguous
    dynamic-slice add into the (padded) framebuffer.  Rays whose pixel is
    past num_pixels (final-wave padding) are zeroed first.
    """
    wave_size = radiance.shape[0]
    wp = wave_size // spp
    in_range = pixel < num_pixels
    radiance = jnp.where(in_range[:, None], radiance, 0.0)
    sums = radiance.reshape(wp, spp, 3).sum(axis=1)
    pix0 = jnp.asarray(pix_base, jnp.int32)
    cur = jax.lax.dynamic_slice(framebuffer, (pix0, 0), (wp, 3))
    framebuffer = jax.lax.dynamic_update_slice(framebuffer, cur + sums, (pix0, 0))
    wave_segments = jnp.sum(jnp.where(in_range, segments, 0), dtype=jnp.int32)
    return framebuffer, wave_segments


@partial(
    jax.jit,
    static_argnames=(
        "width", "spp", "max_bounce", "wave_size", "num_pixels", "num_waves",
        "use_fused", "ext",
    ),
    donate_argnames=("framebuffer",),
)
def render_frame_chunk(
    scene: DeviceScene,
    framebuffer,
    cam_origin,
    cam_lower_left,
    cam_right,
    cam_up,
    width: int,
    spp: int,
    max_bounce: int,
    wave_size: int,
    num_pixels: int,
    num_waves: int,
    start_wave,
    base_key,
    use_fused: bool | None = None,
    ext=None,
):
    """``num_waves`` waves in ONE device call via lax.fori_loop.

    The per-wave Python dispatch (profiled ~29 ms host gap per 0.5M-ray
    wave, docs/PERFORMANCE.md) disappears: the whole frame — or a bounded
    chunk of it, so a single device call can't run away on huge frames —
    is one XLA program, like the sharded path's per-device wave loop.
    Returns (framebuffer, segments int32).
    """
    wave_pixels = wave_size // spp

    def body(wv, carry):
        fb, segs = carry
        wave = start_wave + wv
        pixel, radiance, segments = render_wave(
            scene,
            cam_origin,
            cam_lower_left,
            cam_right,
            cam_up,
            width,
            spp,
            max_bounce,
            (wave * wave_size).astype(jnp.int32),
            wave_size,
            base_key,
            pix_base=(wave * wave_pixels).astype(jnp.int32),
            use_fused=use_fused,
            ext=ext,
        )
        fb, wave_segs = accumulate_wave(
            fb, pixel, radiance, segments, wave * wave_pixels, spp, num_pixels
        )
        return fb, segs + wave_segs

    return jax.lax.fori_loop(
        0, num_waves, body, (framebuffer, jnp.int32(0))
    )


@partial(
    jax.jit,
    static_argnames=(
        "width", "spp", "max_bounce", "wave_size", "num_pixels", "use_fused", "ext",
    ),
    donate_argnames=("framebuffer",),
)
def render_wave_accumulate(
    scene: DeviceScene,
    framebuffer,
    cam_origin,
    cam_lower_left,
    cam_right,
    cam_up,
    width: int,
    spp: int,
    max_bounce: int,
    g_start,
    wave_size: int,
    num_pixels: int,
    base_key,
    pix_base,
    use_fused: bool | None = None,
    ext=None,
):
    """Jitted wave render + accumulate into the padded framebuffer.

    ``wave_size`` must be a multiple of spp (pixel-aligned waves) and the
    framebuffer padded to ``num_waves * wave_size / spp`` rows.  Returns
    (framebuffer, wave_segments) with wave_segments an int32 scalar (host
    accumulates across waves).
    """
    pixel, radiance, segments = render_wave(
        scene,
        cam_origin,
        cam_lower_left,
        cam_right,
        cam_up,
        width,
        spp,
        max_bounce,
        g_start,
        wave_size,
        base_key,
        pix_base=pix_base,
        use_fused=use_fused,
        ext=ext,
    )
    return accumulate_wave(
        framebuffer, pixel, radiance, segments, pix_base, spp, num_pixels
    )
