"""Microbench: where do the trace kernel's cycles go on a tiny bank?

Variants of the tile update over a 4-tile (1024-triangle) resident bank at
R=262144 rays, timed on the real chip.  Scratch tooling, not part of the
suite.
"""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zig_raytracing_contest_tpu.ops import mxu_intersect as mi

R = 1 << 18
T = 1024  # 4 tiles
KT = mi.TRI_TILE
INF = jnp.inf


def best_time(fn, n=10):
    fn()
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def make_bank(seed=0):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-8, 8, (T, 3))
    e1 = rng.uniform(-0.5, 0.5, (T, 3))
    e2 = rng.uniform(-0.5, 0.5, (T, 3))
    return mi.bake_triangles(v0, e1, e2)


def make_state(seed=1):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-8, 8, (3, R)).astype(np.float32)
    d = rng.standard_normal((3, R)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    st = np.zeros((16, R), np.float32)
    st[0:3] = o
    st[3:6] = d
    st[6:9] = 1.0
    st[12] = 1.0
    return jnp.asarray(st)


# --- variant kernels -------------------------------------------------------

def _tail(t, u, v, det, s, Tp, aux_ref, idx_ref, extract_uv=True):
    ok = (det >= mi.MT_EPSILON) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > 0.0)
    t = jnp.where(ok, t, INF)
    tile_min = jnp.min(t, axis=0)
    ids = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
    cand = jnp.min(jnp.where(t <= tile_min[None, :], ids, Tp), axis=0)
    best_t = aux_ref[2, :]
    better = tile_min < best_t
    if extract_uv:
        sel = ids == cand[None, :]
        u_sel = jnp.sum(jnp.where(sel, u, 0.0), axis=0)
        v_sel = jnp.sum(jnp.where(sel, v, 0.0), axis=0)
        aux_ref[0, :] = jnp.where(better, u_sel, aux_ref[0, :])
        aux_ref[1, :] = jnp.where(better, v_sel, aux_ref[1, :])
    aux_ref[2, :] = jnp.where(better, tile_min, best_t)
    idx_ref[0, :] = jnp.where(better, s + cand, idx_ref[0, :])


def make_kernel(mode, extract_uv=True, cull=True):
    def kernel(state_ref, tri_ref, bbox_ref, aux_ref, idx_ref):
        Tp = tri_ref.shape[1]
        num_tiles = bbox_ref.shape[1]
        o, d, inv, active = mi._init_trace_refs(state_ref, aux_ref, idx_ref)
        ox, oy, oz = o
        dx, dy, dz = d

        def tile_body(jt, _):
            def update():
                s = pl.multiple_of(jt * KT, KT)
                rows = tri_ref[:, pl.ds(s, KT)]
                m = lambda r: rows[r][:, None]
                if mode == "mxu":
                    o_mat = jnp.stack([ox, oy, oz], axis=0)
                    d_mat = jnp.stack([dx, dy, dz], axis=0)
                    dn = (((0,), (0,)), ((), ()))

                    def apply(row0, vec):
                        return jax.lax.dot_general(
                            rows[row0: row0 + 3], vec, dimension_numbers=dn,
                            preferred_element_type=jnp.float32)

                    ou = apply(0, o_mat) + m(9)
                    ov = apply(3, o_mat) + m(10)
                    ow = apply(6, o_mat) + m(11)
                    du = apply(0, d_mat)
                    dv = apply(3, d_mat)
                    dw = apply(6, d_mat)
                elif mode == "mxu2":
                    # ONE dot_general: (9, Kt)^T . (3, 2*LB) via stacked rows
                    od = jnp.concatenate(
                        [jnp.stack([ox, oy, oz], 0), jnp.stack([dx, dy, dz], 0)],
                        axis=1)  # (3, 2LB)
                    dn = (((0,), (0,)), ((), ()))
                    big = jax.lax.dot_general(
                        jnp.concatenate([rows[0:3], rows[3:6], rows[6:9]], axis=1),
                        od, dimension_numbers=dn,
                        preferred_element_type=jnp.float32)  # (3Kt, 2LB)
                    LB = ox.shape[0]
                    ou = big[0:KT, 0:LB] + m(9)
                    ov = big[KT:2 * KT, 0:LB] + m(10)
                    ow = big[2 * KT:3 * KT, 0:LB] + m(11)
                    du = big[0:KT, LB:]
                    dv = big[KT:2 * KT, LB:]
                    dw = big[2 * KT:3 * KT, LB:]
                else:  # vpu
                    ou = m(0) * ox + m(1) * oy + m(2) * oz + m(9)
                    ov = m(3) * ox + m(4) * oy + m(5) * oz + m(10)
                    ow = m(6) * ox + m(7) * oy + m(8) * oz + m(11)
                    du = m(0) * dx + m(1) * dy + m(2) * dz
                    dv = m(3) * dx + m(4) * dy + m(5) * dz
                    dw = m(6) * dx + m(7) * dy + m(8) * dz
                t = -ow / dw
                u = ou + t * du
                v = ov + t * dv
                det = -dw * m(12)
                _tail(t, u, v, det, s, Tp, aux_ref, idx_ref, extract_uv)

            if cull:
                jc = jnp.minimum(jt, num_tiles - 1)
                hit = mi._cull_mask(bbox_ref, jc, o, inv, aux_ref[2, :], active)

                @pl.when(jnp.any(hit))
                def _():
                    update()
            else:
                update()
            return 0

        jax.lax.fori_loop(0, num_tiles, tile_body, 0)

    return kernel


@partial(jax.jit, static_argnames=("mode", "extract_uv", "cull", "lane_block"))
def run(tris, state16, mode="mxu", extract_uv=True, cull=True, lane_block=1024):
    nb = R // lane_block
    aux, idx = pl.pallas_call(
        make_kernel(mode, extract_uv, cull),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((16, lane_block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(tris.tri_data.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(tris.tile_bbox.shape, lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, lane_block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lane_block), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, R), jnp.float32),
            jax.ShapeDtypeStruct((1, R), jnp.int32),
        ],
    )(state16, tris.tri_data, tris.tile_bbox)
    return aux, idx


def main():
    tris = make_bank()
    st = make_state()
    base = best_time(lambda: mi.trace_emit_aux(tris, st))
    print(f"trace_emit_aux (production): {base*1e3:7.2f} ms")
    for lane_block in (512, 1024):
        for mode in ("vpu", "mxu"):
            for extract_uv in (True, False):
                for cull in (True, False):
                    t = best_time(lambda: run(
                        tris, st, mode=mode, extract_uv=extract_uv,
                        cull=cull, lane_block=lane_block))
                    print(f"lb={lane_block} mode={mode:4s} uv={int(extract_uv)}"
                          f" cull={int(cull)}: {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
