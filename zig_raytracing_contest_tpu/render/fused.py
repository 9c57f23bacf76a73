"""Fused Pallas shading: one bounce of shading in a handful of device ops.

Profiling (docs/PERFORMANCE.md) showed the XLA shading path fragmenting
into ~150 small fusions per bounce whose per-op overhead dominated the
wave.  This module reduces a bounce's shading to:

    prep kernel   →  texel indices + interpolated attrs     (Pallas, VPU)
    ONE gather    →  all 8 texels of both textures          (XLA)
    shade kernel  →  bilinear, alpha test, scatter, RNG,
                     radiance/throughput/alive updates      (Pallas, VPU)

Mosaic has no arbitrary in-kernel gather on v5e (only same-shape
``dynamic_gather``), so the texel fetch stays in XLA — but batched into a
single wide ``take`` instead of eight row gathers.

Layout: per-ray data is TRANSPOSED — fields on sublanes, rays on lanes:
``aux`` (8, R), ``svec`` (8, R), ``state`` (16, R), ``rec`` (24, R).
Ray-major (R, k<128) blocks pad their lane dimension to 128 inside Mosaic,
so every field slice materialized ~0.5 MB of vreg spill and the kernels blew
the 16 MB scoped-VMEM limit; field-major rows are dense lane vectors, the
VPU's native shape.  Semantics are identical to wavefront.shade_and_scatter
(the CPU/XLA path); tests/test_fused.py holds them equal in interpret mode.

Row layouts:
  aux   (8, R) f32: [u, v, t, streams(bitcast u32), alive,
                     tiles-swept diag, tree-expansions diag, 0] — rows 5/6
                     are traversal diagnostics and depend on which kernel
                     variant ran; only rows 0-4 are contractual
  svec  (8, R) f32: [nx, ny, nz, fu, fv, tc_u, tc_v, 0]
  state (16, R) f32: [ox, oy, oz, dx, dy, dz, tr, tg, tb, rr, rg, rb,
                      alive, streams(bitcast), segments, pad]
  tex_idx (8, R) i32: base [p11, p21, p12, p22], emissive [p11, p21, p12, p22]
  texels  (2n, R) u32: row = half*n + texel of the u16x2-packed bank (the axis-1
                       gather from color_data_t reshapes to this for free)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.mxu_intersect import TREE_MAX_STACK
from ..ops.rng import _bits, _u01
from ..scene.types import (
    PACKED_COLS,
    PAGE_ROWS,
    PAGE_SUB,
    PAGE_TEXELS,
    PAGE_TILE_H,
    PAGE_TILE_W,
    PCOL_BASE,
    PCOL_EMIS,
    PCOL_NRM,
    PCOL_UV,
    DeviceScene,
)

_TILE_W_SHIFT = PAGE_TILE_W.bit_length() - 1
_TILE_H_SHIFT = PAGE_TILE_H.bit_length() - 1

# Rays per grid step (lane dimension).  Large to amortize the ~10 µs
# per-grid-step overhead; a (32, SHADE_BLOCK) f32 block is 2 MB.
SHADE_BLOCK = 8192
FLT_EPSILON = float(jnp.finfo(jnp.float32).eps)
_TWO_PI = 6.283185307179586


def _texel_pair(c, size_f, lo_f, hi_f, is_repeat):
    """Float-math texel indices — identical to ops/texture.py."""
    fc = c - jnp.floor(c)
    r1 = jnp.minimum(jnp.floor(size_f * fc), size_f - 1.0)
    r2 = r1 + 1.0
    r2 = jnp.where(r2 >= size_f, r2 - size_f, r2)
    cc = jnp.floor(size_f * jnp.clip(c, -8.0e9, 8.0e9))
    c1 = jnp.clip(cc, lo_f, hi_f)
    c2 = jnp.clip(cc + 1.0, lo_f, hi_f)
    return jnp.where(is_repeat, r1, c1), jnp.where(is_repeat, r2, c2)


def _make_prep_kernel(emissive_dummy: bool, block_skip: bool,
                      tiled: bool = False):
    def _prep_kernel(rec_ref, aux_ref, idx_ref, svec_ref):
        if not block_skip:
            # No bounce sorting ⇒ dead rays are scattered, whole-dead blocks
            # are rare, and the branch costs more than it saves (measured).
            return _prep_live(rec_ref, aux_ref, idx_ref, svec_ref,
                              emissive_dummy, tiled)
        # Compaction dividend: bounce sorting packed the dead rays into
        # all-dead lane blocks (wavefront._ray_sort_key) — write zeros and
        # skip the interpolation/index math entirely.
        alive_any = jnp.any(aux_ref[4, :] > 0.0)

        @pl.when(~alive_any)
        def _():
            idx_ref[:, :] = jnp.zeros(idx_ref.shape, jnp.int32)
            svec_ref[:, :] = jnp.zeros(svec_ref.shape, jnp.float32)

        @pl.when(alive_any)
        def _():
            _prep_live(rec_ref, aux_ref, idx_ref, svec_ref, emissive_dummy,
                       tiled)

    return _prep_kernel


def _prep_math(rec, u, v, emissive_dummy: bool, tiled: bool = False):
    """Interpolation + texture-index math shared by the 3-stage prep kernel
    and the single-kernel shade.  ``rec`` is an accessor row → (B,) values.
    Returns (idx rows list[8], svec rows list[8]) as values.

    ``tiled``: the scene baked the TILED texel layout (scene/types
    _tiled_texel_map — set whenever a paged bank exists): texel indices
    address 64×32-tile-paged bank space for LARGE textures and a shared
    contiguous row-major region for small ones, so a beam's square uv
    footprint demands O(footprint/tile) pages instead of
    O(footprint-height in texture rows)."""
    w0 = 1.0 - u - v

    tc_u = rec(PCOL_UV + 0) * w0 + rec(PCOL_UV + 2) * u + rec(PCOL_UV + 4) * v
    tc_v = rec(PCOL_UV + 1) * w0 + rec(PCOL_UV + 3) * u + rec(PCOL_UV + 5) * v
    nx = rec(PCOL_NRM + 0) * w0 + rec(PCOL_NRM + 3) * u + rec(PCOL_NRM + 6) * v
    ny = rec(PCOL_NRM + 1) * w0 + rec(PCOL_NRM + 4) * u + rec(PCOL_NRM + 7) * v
    nz = rec(PCOL_NRM + 2) * w0 + rec(PCOL_NRM + 5) * u + rec(PCOL_NRM + 8) * v

    def tex_indices(d):
        # Packed descriptor (scene/types.py build_packed_record):
        # [offset, ±w, ±h, scale], sign = repeat wrap on that axis; clamp
        # bounds are always [0, size-1].
        wf_s = rec(d + 1)
        hf_s = rec(d + 2)
        wf = jnp.abs(wf_s)
        hf = jnp.abs(hf_s)
        x1, x2 = _texel_pair(tc_u, wf, 0.0, wf - 1.0, wf_s < 0)
        y1, y2 = _texel_pair(tc_v, hf, 0.0, hf - 1.0, hf_s < 0)
        off = rec(d).astype(jnp.int32)
        w_i = wf.astype(jnp.int32)
        x1i, x2i = x1.astype(jnp.int32), x2.astype(jnp.int32)
        y1i, y2i = y1.astype(jnp.int32), y2.astype(jnp.int32)
        if not tiled:
            y1w, y2w = y1i * w_i, y2i * w_i
            return [off + y1w + x1i, off + y1w + x2i, off + y2w + x1i,
                    off + y2w + x2i]
        # Tiled bank space (scene/types._tiled_texel_map): textures that
        # fit one 64×32 tile are packed contiguously row-major (q = off +
        # y·w + x); larger textures are paged by 64×32 tiles, x-major
        # over tiles.  Same static rule as the bake, per lane.
        h_i = hf.astype(jnp.int32)
        small = (w_i <= PAGE_TILE_W) & (h_i <= PAGE_TILE_H)
        tiles_x = (w_i + (PAGE_TILE_W - 1)) >> _TILE_W_SHIFT

        def q(xi, yi):
            q_small = off + yi * w_i + xi
            q_big = (
                off
                + ((yi >> _TILE_H_SHIFT) * tiles_x + (xi >> _TILE_W_SHIFT))
                * PAGE_TEXELS
                + ((yi & (PAGE_TILE_H - 1)) << _TILE_W_SHIFT)
                + (xi & (PAGE_TILE_W - 1))
            )
            return jnp.where(small, q_small, q_big)

        return [q(x1i, y1i), q(x2i, y1i), q(x1i, y2i), q(x2i, y2i)]

    idx = tex_indices(PCOL_BASE)
    if emissive_dummy:
        # Every emissive entry is a 1×1 dummy: its only texel sits at the
        # descriptor offset — one fetch instead of four bilinear corners.
        zero = jnp.zeros_like(idx[0])
        idx += [rec(PCOL_EMIS).astype(jnp.int32), zero, zero, zero]
    else:
        idx += tex_indices(PCOL_EMIS)

    svec = [
        nx, ny, nz,
        jnp.abs(tc_u - jnp.trunc(tc_u)),
        jnp.abs(tc_v - jnp.trunc(tc_v)),
        # u16 dequant multipliers of the two textures
        rec(PCOL_BASE + 3),
        rec(PCOL_EMIS + 3),
        jnp.zeros_like(tc_u),
    ]
    return idx, svec


def _prep_live(rec_ref, aux_ref, idx_ref, svec_ref, emissive_dummy: bool,
               tiled: bool = False):
    idx, svec = _prep_math(
        lambda k: rec_ref[k, :], aux_ref[0, :], aux_ref[1, :], emissive_dummy,
        tiled,
    )
    for k in range(8):
        idx_ref[k, :] = idx[k]
        svec_ref[k, :] = svec[k]


def _make_shade_kernel(bounce: int, emissive_dummy: bool, block_skip: bool):
    n_texels = 5 if emissive_dummy else 8

    def _shade_kernel(aux_ref, svec_ref, tex_ref, state_ref, out_state_ref):
        # tex_ref carries the XLA-gathered packed texels (2n, R) int32.
        # (An in-kernel lane-LUT variant via take_along_axis was tried and
        # CANNOT work on v5e: Mosaic's dynamic_gather requires identical
        # input/index shapes and a source spanning ONE vreg along the
        # gather dimension — "Multiple source vregs along gather dimension:
        # Not implemented".  See docs/PERFORMANCE.md.)
        def get_texel(texel):
            lo = tex_ref[texel, :]
            hi = tex_ref[n_texels + texel, :]
            return (
                (lo & 0xFFFF).astype(jnp.float32),
                jax.lax.shift_right_logical(lo, 16).astype(jnp.float32),
                (hi & 0xFFFF).astype(jnp.float32),
                jax.lax.shift_right_logical(hi, 16).astype(jnp.float32),
            )

        sv = lambda k: svec_ref[k, :]
        if not block_skip:
            return _shade_live(
                aux_ref, sv, get_texel, state_ref, out_state_ref,
                bounce, emissive_dummy,
            )
        alive = aux_ref[4, :] > 0.0
        alive_any = jnp.any(alive)

        @pl.when(~alive_any)
        def _():
            # All-dead block (bounce sorting compacts dead rays here): the
            # state passes through untouched — identical to the masked math.
            out_state_ref[:, :] = state_ref[:, :]

        @pl.when(alive_any)
        def _():
            _shade_live(
                aux_ref, sv, get_texel, state_ref, out_state_ref,
                bounce, emissive_dummy,
            )

    return _shade_kernel


def _shade_live(aux_ref, sv, get_texel, state_ref, out_state_ref,
                bounce: int, emissive_dummy: bool):
    """Shading core shared by the 3-stage and single-kernel paths.

    ``sv(k)`` reads svec row k; ``get_texel(i)`` returns texel i's four
    channels as u16-VALUED f32 (pre-dequant — identical values whether
    unpacked from the int32-packed gather or extracted by one-hot matmul).
    Dequantize each channel FIRST (f32(u16) * scale — the exact f32 product
    the bank bakes, materials._quantize_bank), then bilinear in the same
    order as ops/texture.py: bit-identical to the XLA path."""
    if True:
        t = aux_ref[2, :]
        streams = pltpu.bitcast(aux_ref[3:4, :], jnp.uint32)[0, :]
        alive = aux_ref[4, :] > 0.0
        missed = ~(t < jnp.inf)

        fu = sv(3)
        fv = sv(4)

        def dequant4(texel, scale):
            r, g, b, a = get_texel(texel)
            return (r * scale, g * scale, b * scale, a * scale)

        base_scale = sv(5)
        emis_scale = sv(6)
        p11 = dequant4(0, base_scale)
        p21 = dequant4(1, base_scale)
        p12 = dequant4(2, base_scale)
        p22 = dequant4(3, base_scale)

        def bilinear(c):
            r1 = p11[c] * (1.0 - fu) + p21[c] * fu
            r2 = p12[c] * (1.0 - fu) + p22[c] * fu
            return r1 * (1.0 - fv) + r2 * fv

        ar = bilinear(0)
        ag = bilinear(1)
        ab = bilinear(2)
        opacity = bilinear(3)
        if emissive_dummy:
            # single dummy texel per channel (a bilinear of four identical
            # texels equals the texel up to one rounding)
            er, eg, eb, _ = dequant4(4, emis_scale)
        else:
            e11 = dequant4(4, emis_scale)
            e21 = dequant4(5, emis_scale)
            e12 = dequant4(6, emis_scale)
            e22 = dequant4(7, emis_scale)

            def ebil(c):
                r1 = e11[c] * (1.0 - fu) + e21[c] * fu
                r2 = e12[c] * (1.0 - fu) + e22[c] * fu
                return r1 * (1.0 - fv) + r2 * fv

            er = ebil(0)
            eg = ebil(1)
            eb = ebil(2)

        # stochastic alpha + diffuse scatter randomness (matches ops/rng.py)
        rnd = _u01(_bits(streams, 2 * bounce + 1, 0))
        pass_through = rnd > opacity
        g_tag = 2 * bounce + 2
        u1 = _u01(_bits(streams, g_tag, 0))
        u2 = _u01(_bits(streams, g_tag, 1))
        u3 = _u01(_bits(streams, g_tag, 2))
        u4 = _u01(_bits(streams, g_tag, 3))
        r1 = jnp.sqrt(-2.0 * jnp.log(u1))
        r2 = jnp.sqrt(-2.0 * jnp.log(u3))
        gx = r1 * jnp.cos(_TWO_PI * u2)
        gy = r1 * jnp.sin(_TWO_PI * u2)
        gz = r2 * jnp.cos(_TWO_PI * u4)
        g_inv = jax.lax.rsqrt(gx * gx + gy * gy + gz * gz)
        swx = sv(0) + gx * g_inv
        swy = sv(1) + gy * g_inv
        swz = sv(2) + gz * g_inv
        s_inv = jax.lax.rsqrt(swx * swx + swy * swy + swz * swz)

        ox = state_ref[0, :]
        oy = state_ref[1, :]
        oz = state_ref[2, :]
        dx = state_ref[3, :]
        dy = state_ref[4, :]
        dz = state_ref[5, :]
        tr = state_ref[6, :]
        tg = state_ref[7, :]
        tb = state_ref[8, :]
        rr = state_ref[9, :]
        rg = state_ref[10, :]
        rb = state_ref[11, :]

        # sky on miss (src/stage3.zig:144-150)
        sky_t = 0.5 * (dy + 1.0)
        env_w = jnp.where(alive & missed, 1.0, 0.0)
        rr = rr + env_w * tr * (1.0 - 0.5 * sky_t)
        rg = rg + env_w * tg * (1.0 - 0.3 * sky_t)
        rb = rb + env_w * tb

        shaded = alive & ~missed & ~pass_through
        sh_w = jnp.where(shaded, 1.0, 0.0)
        rr = rr + sh_w * tr * er
        rg = rg + sh_w * tg * eg
        rb = rb + sh_w * tb * eb
        tr = jnp.where(shaded, tr * ar, tr)
        tg = jnp.where(shaded, tg * ag, tg)
        tb = jnp.where(shaded, tb * ab, tb)

        stepped = alive & ~missed
        t_step = t + FLT_EPSILON
        out_state_ref[0, :] = jnp.where(stepped, ox + dx * t_step, ox)
        out_state_ref[1, :] = jnp.where(stepped, oy + dy * t_step, oy)
        out_state_ref[2, :] = jnp.where(stepped, oz + dz * t_step, oz)
        ndx = jnp.where(pass_through, dx, swx * s_inv)
        ndy = jnp.where(pass_through, dy, swy * s_inv)
        ndz = jnp.where(pass_through, dz, swz * s_inv)
        out_state_ref[3, :] = jnp.where(stepped, ndx, dx)
        out_state_ref[4, :] = jnp.where(stepped, ndy, dy)
        out_state_ref[5, :] = jnp.where(stepped, ndz, dz)
        out_state_ref[6, :] = tr
        out_state_ref[7, :] = tg
        out_state_ref[8, :] = tb
        out_state_ref[9, :] = rr
        out_state_ref[10, :] = rg
        out_state_ref[11, :] = rb
        out_state_ref[12, :] = jnp.where(stepped, 1.0, 0.0)  # alive out
        out_state_ref[13, :] = aux_ref[3, :]  # streams pass-through
        # segment counter: one traced segment for every ray alive-in
        out_state_ref[14, :] = state_ref[14, :] + jnp.where(alive, 1.0, 0.0)
        out_state_ref[15, :] = jnp.zeros_like(t)


# Lane-chunk width of the in-kernel one-hot texel fetch: bounds the
# (Pp, ONEHOT_CHUNK) one-hot transient (2 MB at the ONEHOT_MAX_TEXELS cap).
ONEHOT_CHUNK = 512

_PAGE_BIG = 1 << 30  # past any real page id (bank cap is PAGED_MAX_TEXELS)

# Paged banks at or under this stay VMEM-resident (direct in-kernel page
# slices); bigger banks live in HBM and the fetch loop DMAs each demanded
# (PAGE_ROWS, 1024) page into a double-buffered VMEM scratch — the same
# cull-gated streaming the trace kernel uses for triangle tiles
# (ops/mxu_intersect._trace_kernel_t_hbm_body).  4 MB = 2^16 texels at
# the corner-expanded 64 B/texel; the whole-path kernel's other residents
# (tri_data ≤1.7 MB + shade table ≤3.1 MB + one-hot transient 2 MB) still
# fit beside it in ~16 MB VMEM.
PAGED_VMEM_MAX_BYTES = 4 << 20


def _bank_hbm(shape) -> bool:
    """Whether a texel bank of this static shape lives in HBM (streamed
    per-page by DMA) rather than VMEM.  Call sites pick the BlockSpec
    memory space and the kernels pick the fetch path from the SAME static
    rule, so they can never disagree."""
    rows, cols = shape
    return rows != 4 and rows * cols * 4 > PAGED_VMEM_MAX_BYTES


def _fetch_paged(bank_ref, idx, demand):
    """Texel fetch from a CORNER-EXPANDED paged bank
    (scene/types._pack_paged_bank): page p is the (PAGE_ROWS, 1024) f32
    block at rows [PAGE_ROWS·p, PAGE_ROWS·(p+1)), holding PAGE_TEXELS
    texels' four bilinear corners as row = (4·corner + channel)·PAGE_SUB
    + sub (sub = in-page texel bits 10..), col = texel & 1023.

    ``idx`` holds the BASE-corner texel index per fetched texture (the
    p11 of _prep_math; one entry for base color, one for emissive); the
    bank bakes each texel's +x/+y/+xy wrap-mode neighbors alongside it,
    so ONE (PAGE_ROWS, 1024) × (1024, CH) one-hot dot per page per
    texture fetches all four corners × four channels — versus four
    separate one-hot builds and dots, whose (1024, CH) compare+cast
    transients dominated the first paged design (measured 10.2 vs 28
    Mrays/s on a 128² floor).  Page size is pinned by measurement —
    bigger pages make the dot proportionally more expensive without
    cutting iterations (scene/types.py PAGE_TEXELS rationale).

    Beam-sorted lane blocks are texel-coherent, so instead of one-hotting
    the whole bank (unaffordable past ~1024 texels) this while-loops over
    the chunk's DEMANDED pages in ascending order.
    Iteration count = distinct pages demanded by the chunk.
    Lanes outside ``demand`` (dead or missed) contribute no pages and
    read 0 — their texels never reach ray state (_shade_live masks every
    texel-dependent write by alive & ~missed).

    Returns [len(idx)] arrays of (16, B) f32 u16-valued rows, row =
    4·corner + channel.
    """
    n_idx = len(idx)
    B = demand.shape[0]
    big = jnp.int32(_PAGE_BIG)
    hbm = _bank_hbm(bank_ref.shape)
    out = [[] for _ in range(n_idx)]
    for c0 in range(0, B, ONEHOT_CHUNK):
        ch_demand = demand[c0 : c0 + ONEHOT_CHUNK]
        # One while-loop PER TEXTURE, not a shared loop over the union of
        # pages: each texture pays only its own distinct pages (emissive
        # dummies typically all sit in one page, while the union loop
        # charged every texture a compare+cast+dot on every page).
        for k in range(n_idx):
            idx_c = idx[k][c0 : c0 + ONEHOT_CHUNK]
            page_shift = PAGE_TEXELS.bit_length() - 1
            pages = jnp.where(ch_demand, idx_c >> page_shift, big)
            CH = idx_c.shape[0]

            def next_page(last, pages=pages):
                return jnp.min(jnp.where(pages > last, pages, big))

            def accumulate(cur, acc, pg, idx_c=idx_c, pages=pages, CH=CH):
                iota = jax.lax.broadcasted_iota(jnp.int32, (1024, CH), 0)
                local = idx_c - cur * PAGE_TEXELS
                hit = pages == cur  # == cur ⟹ demanded ∧ in-page
                col = jnp.where(hit, local & 1023, -1)
                res = jax.lax.dot_general(
                    pg,
                    (iota == col[None, :]).astype(jnp.float32),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # (PAGE_ROWS, CH): res[PAGE_SUB·r + s] = row r, sub s
                sub = local >> 10

                def pick(r):
                    val = res[PAGE_SUB * r]
                    for s in range(1, PAGE_SUB):
                        val = jnp.where(sub == s, res[PAGE_SUB * r + s], val)
                    return val

                return tuple(
                    jnp.where(hit, pick(r), acc[r]) for r in range(16)
                )

            zeros = tuple(jnp.zeros((CH,), jnp.float32) for _ in range(16))

            if not hbm:
                def cond(carry):
                    return carry[0] < big

                def body(carry, next_page=next_page, accumulate=accumulate):
                    cur, acc = carry
                    s = pl.multiple_of(cur * PAGE_ROWS, PAGE_ROWS)
                    pg = bank_ref[pl.ds(s, PAGE_ROWS), :]  # one page
                    return next_page(cur), accumulate(cur, acc, pg)

                _, acc = jax.lax.while_loop(
                    cond, body, (next_page(jnp.int32(-1)), zeros),
                )
            else:
                # HBM bank: stream each demanded page through a
                # double-buffered VMEM scratch so page j+1's copy overlaps
                # page j's one-hot dot (mirrors the trace kernel's
                # tile-stream, ops/mxu_intersect.py:976-1006).
                def scoped(scratch, sems, next_page=next_page,
                           accumulate=accumulate, zeros=zeros):
                    def get_dma(slot, page):
                        s = pl.multiple_of(page * PAGE_ROWS, PAGE_ROWS)
                        return pltpu.make_async_copy(
                            bank_ref.at[pl.ds(s, PAGE_ROWS), :],
                            scratch.at[slot],
                            sems.at[slot],
                        )

                    def cond(carry):
                        return carry[0] < big

                    def body(carry):
                        cur, slot, acc = carry
                        nxt = next_page(cur)

                        @pl.when(nxt < big)
                        def _():
                            get_dma(1 - slot, nxt).start()

                        get_dma(slot, cur).wait()
                        acc = accumulate(cur, acc, scratch[slot])
                        return nxt, 1 - slot, acc

                    first = next_page(jnp.int32(-1))

                    @pl.when(first < big)
                    def _():
                        get_dma(jnp.int32(0), first).start()

                    _, _, acc = jax.lax.while_loop(
                        cond, body, (first, jnp.int32(0), zeros),
                    )
                    return acc

                acc = pl.run_scoped(
                    scoped,
                    scratch=pltpu.VMEM((2, PAGE_ROWS, 1024), jnp.float32),
                    sems=pltpu.SemaphoreType.DMA((2,)),
                )
            # 2-D (16, CH) chunk; Mosaic's concatenate can't offset 1-D
            # lane vectors past the first tile, 2-D axis-1 concat is the
            # same op the one-hot fetch already compiles.
            out[k].append(jnp.stack(list(acc)))
    return [
        out[k][0] if len(out[k]) == 1 else jnp.concatenate(out[k], axis=1)
        for k in range(n_idx)
    ]


def _paged_corners(tex16, p11_i, p21_i, p12_i):
    """Reconcile the bank's baked +x/+y neighbors with the reference's
    CLAMP-collapsed bilinear corners, per channel, bit-exactly.

    ``tex16`` is one texture's (16, B) corner-expanded fetch.  When
    _texel_pair collapses an axis (x2 == x1 under clamp — detected as
    p21 == p11 / p12 == p11 index equality), the oracle's second corner
    IS the first; selecting the baked neighbor would diverge, so select
    the collapsed corner instead.  Returns [4][4] rows: corner → channel
    → (B,) u16-valued f32."""
    xeq = p21_i == p11_i
    yeq = p12_i == p11_i
    c = [[tex16[4 * corner + ch] for ch in range(4)] for corner in range(4)]
    p11 = c[0]
    p21 = [jnp.where(xeq, c[0][ch], c[1][ch]) for ch in range(4)]
    p12 = [jnp.where(yeq, c[0][ch], c[2][ch]) for ch in range(4)]
    p22 = [
        jnp.where(
            xeq,
            jnp.where(yeq, c[0][ch], c[2][ch]),
            jnp.where(yeq, c[1][ch], c[3][ch]),
        )
        for ch in range(4)
    ]
    return [p11, p21, p12, p22]


def resident_bank(scene: DeviceScene):
    """The texel bank for single-kernel shading, or None.

    One-hot (4, Pp) banks and paged banks (scene/types._pack_paged_bank)
    both qualify for every single-kernel regime: banks over
    PAGED_VMEM_MAX_BYTES live in HBM and stream demanded pages by DMA
    (_fetch_paged), costing only a 2-page VMEM scratch — so bank size no
    longer forces the per-bounce XLA-gather pipeline."""
    if scene.color_u16f_t is not None:
        return scene.color_u16f_t
    return scene.color_paged_t


def _bank_spec(bank):
    """Full-shape BlockSpec for a texel bank, in the memory space the
    kernels' static `_bank_hbm` rule expects."""
    return pl.BlockSpec(
        bank.shape,
        lambda i: (0, 0),
        memory_space=pl.ANY if _bank_hbm(bank.shape) else pltpu.VMEM,
    )


def _shade1_body(rec_ref, aux_ref, state_ref, bank_ref, out_state_ref,
                 bounce: int, emissive_dummy: bool):
    """One bounce of single-kernel shading over refs: prep math, one-hot
    texel fetch from the VMEM bank, and the shade core.  Shared by the
    standalone shade1 kernel and the whole-path kernel (``state_ref`` and
    ``out_state_ref`` may alias there: every state row is read into values
    before any row is written)."""
    n_idx = 5 if emissive_dummy else 8
    # Bank kind is in the shape: one-hot banks are exactly (4, Pp) channel
    # rows; paged banks (scene/types._pack_paged_bank) are
    # (PAGE_ROWS·pages, 1024).  Paged banks ⟺ the bake used the TILED
    # texel layout, so the index math must too.
    paged = bank_ref.shape[0] != 4
    idx, svec = _prep_math(
        lambda k: rec_ref[k, :], aux_ref[0, :], aux_ref[1, :],
        emissive_dummy, tiled=paged,
    )
    Pp = bank_ref.shape[1]
    B = rec_ref.shape[1]

    if paged:
        demand = (aux_ref[4, :] > 0.0) & (aux_ref[2, :] < jnp.inf)
        fetched = _fetch_paged(bank_ref, [idx[0], idx[4]], demand)
        base_c = _paged_corners(fetched[0], idx[0], idx[1], idx[2])
        if emissive_dummy:
            # idx[4] is the dummy's single texel; its corner 0 serves it.
            emis_c = [[fetched[1][ch] for ch in range(4)]]
        else:
            emis_c = _paged_corners(fetched[1], idx[4], idx[5], idx[6])
        texf = base_c + emis_c

        _shade_live(
            aux_ref,
            lambda k: svec[k],
            lambda i: tuple(texf[i]),
            state_ref,
            out_state_ref,
            bounce,
            emissive_dummy,
        )
        return

    def fetch(indices):  # (B,) int32 → (4, B) f32 u16-valued
        chunks = []
        for c0 in range(0, B, ONEHOT_CHUNK):
            ii = indices[c0 : c0 + ONEHOT_CHUNK]
            onehot = (
                jax.lax.broadcasted_iota(jnp.int32, (Pp, ONEHOT_CHUNK), 0)
                == ii[None, :]
            ).astype(jnp.float32)
            chunks.append(
                jax.lax.dot_general(
                    bank_ref[:, :],
                    onehot,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            )
        return chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis=1)

    texf = [fetch(idx[k]) for k in range(n_idx)]
    _shade_live(
        aux_ref,
        lambda k: svec[k],
        lambda i: (texf[i][0], texf[i][1], texf[i][2], texf[i][3]),
        state_ref,
        out_state_ref,
        bounce,
        emissive_dummy,
    )


def _make_shade1_kernel(bounce: int, emissive_dummy: bool, block_skip: bool):
    """Single-kernel bounce shading for small texel banks: prep math,
    texel fetch AND shading in one Pallas call, so nothing runs in XLA
    between the trace kernel and the new ray state.

    The texel "gather" is a per-chunk one-hot matmul against the VMEM-
    resident (4, Pp) u16-valued bank — bit-exact at HIGHEST precision
    (1.0·x reconstructs u16 integers exactly; verified on-chip) and
    identical to the packed-gather path's unpacked channels."""

    def _shade1_kernel(rec_ref, aux_ref, state_ref, bank_ref, out_state_ref):
        def live():
            _shade1_body(rec_ref, aux_ref, state_ref, bank_ref,
                         out_state_ref, bounce, emissive_dummy)

        if not block_skip:
            return live()
        alive_any = jnp.any(aux_ref[4, :] > 0.0)

        @pl.when(~alive_any)
        def _():
            out_state_ref[:, :] = state_ref[:, :]

        @pl.when(alive_any)
        def _():
            live()

    return _shade1_kernel


def _rspec(rows):
    return pl.BlockSpec((rows, SHADE_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM)


# ---------------------------------------------------------------------------
# Whole-path kernel: ALL bounces of trace + shade in ONE Pallas call.
# ---------------------------------------------------------------------------
# Profiled on the v5e: each Pallas grid step costs ~8-10 µs of fixed
# sequencing overhead, and a frame of the per-bounce pipeline runs
# max_bounce trace calls + max_bounce shade calls per wave — ~25k grid
# steps for a 1080p frame, ~200 ms of pure overhead.  For scenes whose
# transform bank, shade table and texel bank are all VMEM-resident (the
# rec-emit + one-hot regime), the entire bounce loop fuses into one kernel:
# each ray block runs its full path while its state stays on-chip, paying
# the grid-step tax ONCE per wave instead of 2·max_bounce times.
#
# The other dividend is bounce-level dead skipping: on open scenes most
# rays die early (official bench: 87% after bounce 0) and raster-order
# blocks cluster sky pixels, so whole blocks go dead mid-path; the bounce
# loop here skips trace AND shade for them (`pl.when` on any-alive), where
# the per-bounce pipeline still paid full shade math on every block.
#
# Semantics are the per-bounce composition exactly: the trace body and the
# shade body are the same functions (aliasing state in/out is safe — every
# state row is read into values before any write).

PATH_LANE_BLOCK = 1024


def _make_path_kernel(max_bounce: int, emissive_dummy: bool, tile: int,
                      group_tiles: int, bounce0: int = 0,
                      use_prev: bool = False, emit_idx: bool = False):
    from ..ops.mxu_intersect import (
        EXCLUDE_PREV_HIT, _prev_vec, _trace_body_resident,
    )

    def _path_kernel(state_ref, tri_ref, bbox_ref, gbox_ref, tree_ref,
                     table_ref, bank_ref, *rest):
        # Optional previous-hit input (continuation kernels, bounce0 > 0)
        # precedes the outputs; with emit_idx the winner-idx buffer is the
        # SECOND OUTPUT (the caller continues the path after a resort and
        # must seed the next kernel's exclusion), else scratch.
        prev_ref, rest = (rest[0], rest[1:]) if use_prev else (None, rest)
        if emit_idx:
            out_ref, idx_ref, aux_ref, rec_ref, tmin_ref, stack_ref = rest
        else:
            out_ref, aux_ref, idx_ref, rec_ref, tmin_ref, stack_ref = rest
        out_ref[:, :] = state_ref[:, :]
        for bounce in range(bounce0, bounce0 + max_bounce):

            @pl.when(jnp.any(out_ref[12, :] > 0.0))
            def _(bounce=bounce):
                if not EXCLUDE_PREV_HIT:
                    prev = None
                elif bounce == bounce0:
                    # Primaries (bounce 0) have no previous hit; resumed
                    # kernels (bounce0 > 0) get it from the prev input.
                    prev = _prev_vec(prev_ref)
                else:
                    # In-kernel continuation: the previous bounce's winner
                    # is still in idx_ref (read into a value BEFORE the
                    # trace body re-initializes the buffer).  Dead-block
                    # skipping cannot leak another bounce range's idx:
                    # alive only decreases, so reaching bounce b > bounce0
                    # implies this block traced at b - 1.
                    prev = idx_ref[0, :]
                _trace_body_resident(
                    out_ref, tri_ref, bbox_ref, gbox_ref, aux_ref, idx_ref,
                    tmin_ref, table_ref, rec_ref,
                    tile=tile, group_tiles=group_tiles,
                    tree_ref=tree_ref, stack_ref=stack_ref,
                    # Shading runs in-kernel off aux rows 0/1 — UV must be
                    # extracted here regardless of EXTRACT_UV_IN_KERNEL.
                    extract_uv=True,
                    prev=prev,
                )
                _shade1_body(rec_ref, aux_ref, out_ref, bank_ref, out_ref,
                             bounce, emissive_dummy)

    return _path_kernel


# ---------------------------------------------------------------------------
# In-kernel ray generation (fused wave v2).
# ---------------------------------------------------------------------------
# Round-2 profiling (docs/PERFORMANCE.md) charged ~272 ms of XLA fusions and
# ~102 ms of layout copies per ~800 ms official frame to the glue AROUND the
# kernels: the XLA ray-gen stack (16 wide (R,) fusions materializing the
# field-major state to HBM), the sort-key elementwise chain, and the AoS
# radiance transpose + pixel-coord math of the accumulator.  Generating rays
# INSIDE the path kernel from ~30 SMEM scalars removes the first two
# entirely: the wave's primary state never exists in HBM before bounce 0,
# and the (dead, 6-D Morton) sort key is emitted into state row 15 by the
# same kernel, so the only XLA left in a wave is one payload sort + one
# payload unsort (wavefront._sort_state_payload) + the field-major
# accumulate.
#
# Layout: par (32,) f32 SMEM = [origin, lower_left, right, up, bbox_min,
# 32/span, pad...]; meta (8,) i32 SMEM = [slot_base, x_base, y_base, seed,
# tile_base, 0, 0, 0].  Static GenParams pick raster vs 32×32-tiled pixel
# order; tiled order makes every 1024-lane block a compact pixel square
# (beam) instead of a 341-pixel scan-line strip — see rays_tiled below.
#
# RNG parity: streams are keyed on the RASTER global ray id
# (y·width + x)·spp + s exactly like ops/rng.ray_streams, so the rendered
# image is invariant to the pixel ORDER a wave uses.

from typing import NamedTuple


class GenParams(NamedTuple):
    """Static ray-generation geometry (jit cache key)."""

    spp: int
    width: int  # image width (camera/raster math)
    img_w: int
    img_h: int
    tiles_x: int = 0  # 0 = raster slot order; else 32×32 pixel tiles


PAR_ORIGIN = 0
PAR_LLC = 3
PAR_RIGHT = 6
PAR_UP = 9
PAR_BMIN = 12
PAR_SCALE = 15  # 32 / span, per axis
PAR_ROWS = 32
META_SLOT_BASE = 0
META_X_BASE = 1
META_Y_BASE = 2
META_SEED = 3
META_TILE_BASE = 4
META_ROWS = 8
PIX_TILE = 32  # tiled order: 32×32-pixel squares = 1024 slots


def _kdivmod(v, d: float):
    """Exact (v // d, v % d) for 0 <= v < 2^23 in f32 (no int div — the VPU
    expands integer division ~250× slower).  Same fix-up as
    wavefront._exact_divmod_f32."""
    q = jnp.floor(v * jnp.float32(1.0 / d))
    q = jnp.where(q * d > v, q - 1.0, q)
    q = jnp.where((q + 1.0) * d <= v, q + 1.0, q)
    return q, v - q * d


def _gen_rays(par_ref, meta_ref, out_ref, gen: GenParams):
    """Write a freshly-generated primary-ray state16 block into out_ref.

    Mirrors Camera.getRay (src/stage3.zig:27-35) + wave_pixel_coords +
    rng.ray_streams/uniform2 — identical f32 expressions, so the produced
    rays match the XLA ray-gen path.  Rays whose pixel falls outside the
    real image (tile padding) are born dead: alive = 0, radiance = 0,
    segments = 0 — accumulation can then add blindly."""
    lb = out_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, lb), 1)[0]
    i = (pl.program_id(0) * lb + lane).astype(jnp.float32)  # wave ray id
    qi, s = _kdivmod(i, float(gen.spp))  # wave slot id, sample id

    if gen.tiles_x:
        # 32×32-pixel tiles, raster over tiles: slot = tile*1024 + ty*32+tx.
        tile_i, w_in = _kdivmod(qi, float(PIX_TILE * PIX_TILE))
        tile = meta_ref[META_TILE_BASE].astype(jnp.float32) + tile_i
        ty, tx = _kdivmod(w_in, float(PIX_TILE))
        tile_y, tile_x = _kdivmod(tile, float(gen.tiles_x))
        x = tile_x * float(PIX_TILE) + tx
        y = tile_y * float(PIX_TILE) + ty
    else:
        row_off = meta_ref[META_X_BASE].astype(jnp.float32) + qi
        dyy, x = _kdivmod(row_off, float(gen.width))
        y = meta_ref[META_Y_BASE].astype(jnp.float32) + dyy

    xi = x.astype(jnp.int32)
    yi = y.astype(jnp.int32)
    in_range = (xi < gen.img_w) & (yi < gen.img_h)
    # Raster global ray id — the RNG key, invariant to wave pixel order.
    g = (yi * gen.width + xi) * gen.spp + s.astype(jnp.int32)
    seed = meta_ref[META_SEED].astype(jnp.uint32)
    streams = _mix_u32(
        g.astype(jnp.uint32)
        ^ (seed * jnp.uint32(0x9E3779B9))
        ^ jnp.uint32(0x85EBCA6B)
    )

    jx = _u01(_bits(streams, 0, 0))
    jy = _u01(_bits(streams, 0, 1))
    sx = x + jx
    sy = y + jy
    dr = [
        par_ref[PAR_LLC + a] + par_ref[PAR_RIGHT + a] * sx
        + par_ref[PAR_UP + a] * sy
        for a in range(3)
    ]
    inv_len = 1.0 / jnp.sqrt(dr[0] * dr[0] + dr[1] * dr[1] + dr[2] * dr[2])
    ones = jnp.ones((lb,), jnp.float32)
    zeros = jnp.zeros((lb,), jnp.float32)
    for a in range(3):
        out_ref[a, :] = par_ref[PAR_ORIGIN + a] * ones
        out_ref[3 + a, :] = dr[a] * inv_len
        out_ref[6 + a, :] = ones  # throughput
        out_ref[9 + a, :] = zeros  # radiance
    out_ref[12, :] = jnp.where(in_range, 1.0, 0.0)  # alive
    out_ref[13, :] = pltpu.bitcast(streams[None, :], jnp.float32)[0, :]
    out_ref[14, :] = zeros  # segments
    out_ref[15, :] = zeros


def _mix_u32(x):
    """rng._mix inlined for the kernel (same ops, Mosaic-friendly)."""
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def _emit_sort_key(out_ref, par_ref):
    """Write the (dead, 6-D interleaved Morton) beam-sort key into state
    row 15 as a bitcast int32 — the in-kernel twin of
    wavefront._ray_sort_key (same bit layout AND same corridor variant,
    gated by wavefront.SORT_KEY_EXIT; see its docstring for the measured
    rationale — the corridor key A/B'd +17% on the 100k bench)."""
    from .wavefront import SORT_KEY_EXIT  # late: wavefront imports fused

    dead = (out_ref[12, :] <= 0.0).astype(jnp.int32)
    key = jnp.zeros(out_ref.shape[1:], jnp.int32)
    q = []
    dq = []
    if SORT_KEY_EXIT:
        # Scene-exit corridor endpoint: one slab test per lane.  Division
        # is NaN-proofed by clamping |d| away from 0 (sign-preserving) —
        # a heuristic key needs no exact grazing-ray semantics, unlike
        # the cull slab test.  bmax = bmin + span, span = 32 / scale.
        far = None
        o3, d3 = [], []
        for a in range(3):
            o3.append(out_ref[a, :])
            d = out_ref[3 + a, :]
            d = jnp.where(d >= 0.0, jnp.maximum(d, 1e-12),
                          jnp.minimum(d, -1e-12))
            d3.append(d)
            bmin = par_ref[PAR_BMIN + a]
            span = 32.0 / par_ref[PAR_SCALE + a]
            inv = 1.0 / d
            ta = (bmin - o3[a]) * inv
            tb = (bmin + span - o3[a]) * inv
            fa = jnp.maximum(ta, tb)
            far = fa if far is None else jnp.minimum(far, fa)
        texit = jnp.maximum(far, 0.0)
        for a in range(3):
            rel = (o3[a] - par_ref[PAR_BMIN + a]) * par_ref[PAR_SCALE + a]
            q.append(jnp.clip(rel, 0.0, 31.0).astype(jnp.int32))
            ex = rel + d3[a] * texit * par_ref[PAR_SCALE + a]
            dq.append(jnp.clip(ex, 0.0, 31.0).astype(jnp.int32))
    else:
        for a in range(3):
            rel = (
                out_ref[a, :] - par_ref[PAR_BMIN + a]
            ) * par_ref[PAR_SCALE + a]
            q.append(jnp.clip(rel, 0.0, 31.0).astype(jnp.int32))
            dq.append(
                jnp.clip((out_ref[3 + a, :] + 1.0) * 16.0, 0.0, 31.0).astype(
                    jnp.int32
                )
            )
    for b in range(5):
        for a in range(3):
            key = key | (((q[a] >> b) & 1) << (6 * b + 2 * a))
            key = key | (((dq[a] >> b) & 1) << (6 * b + 2 * a + 1))
    key = (dead << 30) | key
    out_ref[15, :] = pltpu.bitcast(key[None, :], jnp.float32)[0, :]


# When True (production), the bounce-0 trace inside the gen kernel passes
# the camera origin as SCALARS: every primary ray shares it (pinhole
# camera, _gen_rays broadcasts par rows 0-2), so the origin half of the
# tile sweep's transform (ou/ov/ow, 18 of ~51 (Kt, LB) vector ops)
# collapses to (Kt, 1) columns — bit-identical by construction (same f32
# ops on the same values).  False = per-lane A/B variant.
SHARED_ORIGIN_B0 = True


def _make_path_kernel_gen(max_bounce: int, emissive_dummy: bool, tile: int,
                          group_tiles: int, gen: GenParams, emit_key: bool,
                          emit_idx: bool = False):
    from ..ops.mxu_intersect import EXCLUDE_PREV_HIT, _trace_body_resident

    def _path_kernel_gen(par_ref, meta_ref, tri_ref, bbox_ref, gbox_ref,
                         tree_ref, table_ref, bank_ref, *rest):
        if emit_idx:
            out_ref, idx_ref, aux_ref, rec_ref, tmin_ref, stack_ref = rest
        else:
            out_ref, aux_ref, idx_ref, rec_ref, tmin_ref, stack_ref = rest
        _gen_rays(par_ref, meta_ref, out_ref, gen)
        for bounce in range(max_bounce):
            origin = None
            if bounce == 0 and SHARED_ORIGIN_B0:
                origin = tuple(par_ref[PAR_ORIGIN + a] for a in range(3))

            @pl.when(jnp.any(out_ref[12, :] > 0.0))
            def _(bounce=bounce, origin=origin):
                # Previous-hit exclusion (see _make_path_kernel): bounce 0
                # is always primaries here — in-kernel ray gen.
                prev = (
                    idx_ref[0, :]
                    if bounce > 0 and EXCLUDE_PREV_HIT else None
                )
                _trace_body_resident(
                    out_ref, tri_ref, bbox_ref, gbox_ref, aux_ref, idx_ref,
                    tmin_ref, table_ref, rec_ref,
                    tile=tile, group_tiles=group_tiles,
                    tree_ref=tree_ref, stack_ref=stack_ref,
                    # Shading runs in-kernel off aux rows 0/1 — UV must be
                    # extracted here regardless of EXTRACT_UV_IN_KERNEL.
                    extract_uv=True,
                    origin=origin,
                    prev=prev,
                )
                _shade1_body(rec_ref, aux_ref, out_ref, bank_ref, out_ref,
                             bounce, emissive_dummy)

        if emit_key:
            _emit_sort_key(out_ref, par_ref)

    return _path_kernel_gen


@partial(
    jax.jit,
    static_argnames=("wave_size", "max_bounce", "emissive_dummy", "gen",
                     "emit_key", "emit_idx", "interpret", "lane_block"),
)
def path_trace_gen(
    tris,  # ops.mxu_intersect.MXUTriangles (VMEM-resident, rec-emit sized)
    par,  # (32,) f32 camera/bbox scalars (see PAR_* rows)
    meta,  # (8,) i32 wave scalars (see META_* rows)
    rec_table,  # (24, Tp) f32 Morton-ordered packed shade table
    bank,  # texel bank: (4, Pp) one-hot, or paged (VMEM/HBM; see _bank_spec)
    wave_size: int,
    max_bounce: int,
    emissive_dummy: bool,
    gen: GenParams,
    emit_key: bool = False,
    emit_idx: bool = False,
    interpret: bool = False,
    lane_block: int = PATH_LANE_BLOCK,
):
    """Generate one wave of primary rays IN-KERNEL and path-trace the first
    ``max_bounce`` bounces in the same Pallas call.  Returns the (16, R)
    state; with ``emit_key`` row 15 carries the beam-sort key (bitcast
    int32) for the caller's argsort.  With ``emit_idx`` returns
    (state, idx (1, R) int32): the last bounce's winner triangle per lane,
    which seeds the continuation kernel's previous-hit exclusion
    (EXCLUDE_PREV_HIT); all-dead blocks leave their idx slice unwritten —
    their lanes are dead, so the exclusion value is never consumed."""
    R = wave_size
    assert R % lane_block == 0, f"wave {R} not a multiple of {lane_block}"
    num_groups = tris.group_bbox.shape[1]
    nb = R // lane_block

    out_specs = [pl.BlockSpec((16, lane_block), lambda i: (0, i),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((16, R), jnp.float32)]
    scratch_shapes = [
        pltpu.VMEM((8, lane_block), jnp.float32),  # aux (running best)
        pltpu.VMEM((1, lane_block), jnp.int32),  # winner idx
        pltpu.VMEM((24, lane_block), jnp.float32),  # winner record
        pltpu.SMEM((num_groups,), jnp.float32),  # group entry t
        pltpu.SMEM((TREE_MAX_STACK,), jnp.int32),  # tree DFS stack
    ]
    if emit_idx:
        out_specs.append(pl.BlockSpec((1, lane_block), lambda i: (0, i),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((1, R), jnp.int32))
        del scratch_shapes[1]  # winner idx is an output now

    out = pl.pallas_call(
        _make_path_kernel_gen(max_bounce, emissive_dummy, tris.tile,
                              tris.group_tiles, gen, emit_key,
                              emit_idx=emit_idx),
        grid=(nb,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((PAR_ROWS,), lambda i: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((META_ROWS,), lambda i: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(tris.tri_data.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tris.tile_bbox.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(tris.group_bbox.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(tris.tree_bbox.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(rec_table.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            _bank_spec(bank),
        ],
        out_specs=out_specs if emit_idx else out_specs[0],
        out_shape=out_shape if emit_idx else out_shape[0],
        scratch_shapes=scratch_shapes,
    )(par, meta, tris.tri_data, tris.tile_bbox, tris.group_bbox,
      tris.tree_bbox, rec_table, bank)
    return out


@partial(
    jax.jit,
    static_argnames=("max_bounce", "emissive_dummy", "interpret",
                     "lane_block", "bounce0", "emit_idx"),
)
def path_trace_fused(
    tris,  # ops.mxu_intersect.MXUTriangles (VMEM-resident, rec-emit sized)
    state16,  # (16, R) f32 field-major primary-ray state
    rec_table,  # (24, Tp) f32 Morton-ordered packed shade table
    bank,  # texel bank: (4, Pp) one-hot, or paged (VMEM/HBM; see _bank_spec)
    max_bounce: int,
    emissive_dummy: bool,
    interpret: bool = False,
    lane_block: int = PATH_LANE_BLOCK,
    bounce0: int = 0,
    prev=None,  # (R,) int32 previous-hit idx (bounce0 > 0 continuations)
    emit_idx: bool = False,
):
    """Path-trace ``max_bounce`` bounces (globally numbered from
    ``bounce0`` — the RNG decorrelation tags are per absolute bounce) in
    one kernel.  Returns the final (16, R) state (radiance rows 9-11,
    segment row 14), identical to composing trace_emit_aux + shade_fused
    over the same bounce range.  ``prev``/``emit_idx``: previous-hit
    exclusion plumbing across a caller's resort — see path_trace_gen."""
    from ..ops.mxu_intersect import EXCLUDE_PREV_HIT

    R = state16.shape[1]
    assert R % lane_block == 0, f"wave {R} not a multiple of {lane_block}"
    num_groups = tris.group_bbox.shape[1]
    nb = R // lane_block
    use_prev = prev is not None and EXCLUDE_PREV_HIT

    in_specs = [
        pl.BlockSpec((16, lane_block), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(tris.tri_data.shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(tris.tile_bbox.shape, lambda i: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec(tris.group_bbox.shape, lambda i: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec(tris.tree_bbox.shape, lambda i: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec(rec_table.shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        _bank_spec(bank),
    ]
    operands = [state16, tris.tri_data, tris.tile_bbox, tris.group_bbox,
                tris.tree_bbox, rec_table, bank]
    if use_prev:
        in_specs.append(pl.BlockSpec((1, lane_block), lambda i: (0, i),
                                     memory_space=pltpu.VMEM))
        operands.append(prev.reshape(1, R).astype(jnp.int32))

    out_specs = [pl.BlockSpec((16, lane_block), lambda i: (0, i),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((16, R), jnp.float32)]
    scratch_shapes = [
        pltpu.VMEM((8, lane_block), jnp.float32),  # aux (running best)
        pltpu.VMEM((1, lane_block), jnp.int32),  # winner idx
        pltpu.VMEM((24, lane_block), jnp.float32),  # winner record
        pltpu.SMEM((num_groups,), jnp.float32),  # group entry t
        pltpu.SMEM((TREE_MAX_STACK,), jnp.int32),  # tree DFS stack
    ]
    if emit_idx:
        out_specs.append(pl.BlockSpec((1, lane_block), lambda i: (0, i),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((1, R), jnp.int32))
        del scratch_shapes[1]  # winner idx is an output now

    out = pl.pallas_call(
        _make_path_kernel(max_bounce, emissive_dummy, tris.tile,
                          tris.group_tiles, bounce0,
                          use_prev=use_prev, emit_idx=emit_idx),
        grid=(nb,),
        interpret=interpret,
        in_specs=in_specs,
        out_specs=out_specs if emit_idx else out_specs[0],
        out_shape=out_shape if emit_idx else out_shape[0],
        scratch_shapes=scratch_shapes,
    )(*operands)
    return out


@partial(jax.jit, static_argnames=("bounce", "interpret", "block_skip"))
def shade_fused(
    scene: DeviceScene,
    state,  # (16, R) f32 field-major ray state (see ops/mxu_intersect.py)
    aux,  # (8, R) f32 from trace_emit_aux: [u, v, t, streams, alive, ...]
    tri_m,  # (R,) int32 Morton-space triangle ids (shade_table_t order)
    bounce: int,
    interpret: bool = False,
    block_skip: bool = False,
    rec=None,  # (24, R) f32: trace-kernel-emitted records (skips the gather)
):
    """One fused shading bounce.  Returns the new (16, R) state.

    Equivalent to wavefront.shade_and_scatter + the caller's mask updates;
    the XLA path remains as the CPU fallback and the semantic oracle.
    """
    R = state.shape[1]
    Rp = -(-R // SHADE_BLOCK) * SHADE_BLOCK

    def padr(a):
        if Rp == R:
            return a
        return jnp.pad(a, ((0, 0),) * (a.ndim - 1) + ((0, Rp - R),))

    nb = Rp // SHADE_BLOCK
    # Static branch: present marker ⇒ every emissive entry is 1×1.
    emissive_dummy = scene.emissive_all_dummy is not None

    if rec is None:
        # Axis-1 gather from the pre-permuted field-major table: no
        # transpose, no perm lookup.  (Resident banks skip this entirely:
        # the trace kernel emits rec via a one-hot MXU matmul.  A missed
        # ray's record is table row tri_m=0 here vs all-zeros there — both
        # only feed texture-index math whose result is masked by alive &
        # ~missed in the shade kernel.)
        rec = jnp.take(scene.shade_table_t, tri_m, axis=1)  # (24, R) packed
    rec = padr(rec)
    aux = padr(aux)

    bank = resident_bank(scene)
    if bank is not None:
        # Resident-bank single-kernel path: zero XLA ops in the bounce.
        # One-hot (4, Pp) or paged (32·pages, 1024) — _shade1_body picks
        # the fetch by bank shape.
        new_state = pl.pallas_call(
            _make_shade1_kernel(bounce, emissive_dummy, block_skip),
            grid=(nb,),
            in_specs=[
                _rspec(PACKED_COLS),
                _rspec(8),
                _rspec(16),
                _bank_spec(bank),
            ],
            out_specs=_rspec(16),
            out_shape=jax.ShapeDtypeStruct((16, Rp), jnp.float32),
            interpret=interpret,
        )(rec, aux, padr(state), bank)
        return new_state[:, :R]

    tex_idx, svec = pl.pallas_call(
        _make_prep_kernel(emissive_dummy, block_skip,
                          tiled=scene.tiled_layout is not None),
        grid=(nb,),
        in_specs=[_rspec(PACKED_COLS), _rspec(8)],
        out_specs=[_rspec(8), _rspec(8)],
        out_shape=[
            jax.ShapeDtypeStruct((8, Rp), jnp.int32),
            jax.ShapeDtypeStruct((8, Rp), jnp.float32),
        ],
        interpret=interpret,
    )(rec, aux)

    n_texels = 5 if emissive_dummy else 8
    # ONE wide XLA texel gather along the packed bank's ray axis: (2, P)
    # int32 taken at (n_texels, Rp) indices → (2, n, Rp) → reshape (2n, Rp)
    # with row = half*n + texel, no transpose.  HALF the gathered elements
    # of the old f32 bank; the shade kernel dequantizes.  Padding rows hit
    # texel 0 — harmless, masked by alive=0.
    texels = jnp.take(scene.color_packed_t, tex_idx[:n_texels], axis=1).reshape(
        2 * n_texels, Rp
    )

    new_state = pl.pallas_call(
        _make_shade_kernel(bounce, emissive_dummy, block_skip),
        grid=(nb,),
        in_specs=[_rspec(8), _rspec(8), _rspec(2 * n_texels), _rspec(16)],
        out_specs=_rspec(16),
        out_shape=jax.ShapeDtypeStruct((16, Rp), jnp.float32),
        interpret=interpret,
    )(aux, svec, texels, padr(state))

    return new_state[:, :R]
