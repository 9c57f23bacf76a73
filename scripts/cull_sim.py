"""Lane-level cull-union simulator — the round-4 decision gate
(docs/NEXT.md).  Two phases:

  python scripts/cull_sim.py --dump /tmp/waves.npz [--side=N] [--R=2^k]
      Runs the real trace per bounce (chip or CPU) and dumps, per bounce,
      the wave's state16 rows 0-5 (origin/direction), the final best t,
      the winner's geometric normal (origin-surface normal of the NEXT
      bounce's rays), and aux row 5 (tiles actually swept, for
      calibration) — plus the baked tile boxes.

  python scripts/cull_sim.py --sim /tmp/waves.npz
      Pure numpy.  For each bounce, computes the occlusion-ideal per-lane
      tile-need set (slab entry <= final best t) and reports, for each
      candidate sub-block granularity L in {1024, 512, 256, 128, 64}:
      the mean union size per L-lane sub-block and the resulting
      TRI-LANE SWEEP OPS PER RAY (union * L * tile / L = union * tile per
      lane) relative to the production granularity — the quantity the
      trace kernel's 2.0-2.4 us/block-sweep is proportional to.  Also
      simulates the tangent-hemisphere cull (docs/NEXT.md candidate 2):
      drops tiles entirely behind the lane's origin-surface tangent
      plane before taking unions.

The dump uses the ACTUAL sampler (same RNG, same sort) so bounce-1+
direction distributions are the production ones, not a model.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def dump(out_path: str, side: int | None, R: int,
         interpret: bool = False, sponza: bool = False) -> None:
    import jax
    import jax.numpy as jnp

    from bench import build_bench_scene, build_large_scene
    from zig_raytracing_contest_tpu.config import Config
    from zig_raytracing_contest_tpu.ops import rng
    from zig_raytracing_contest_tpu.ops.mxu_intersect import trace_emit_aux
    from zig_raytracing_contest_tpu.render import wavefront
    from zig_raytracing_contest_tpu.render.fused import shade_fused
    from zig_raytracing_contest_tpu.render.pipeline import prepare_scene

    width, height = (1280, 720) if side or sponza else (1920, 1080)
    cfg = Config(grid_resolution=(128, 128, 128))
    with tempfile.TemporaryDirectory() as d:
        if sponza:
            sys.path.insert(0, str(Path(__file__).resolve().parent))
            from sponza_builder import write_sponza_glb

            p = write_sponza_glb(Path(d) / "s.glb", detail=1.25)
            scene, cam, _ = prepare_scene(str(p), cfg,
                                          camera_name="Camera 1",
                                          height=height)
            width = cam.width
        else:
            p = (
                build_large_scene(Path(d) / "s.gltf", side=side)
                if side
                else build_bench_scene(Path(d) / "s.gltf")
            )
            scene, cam, _ = prepare_scene(
                str(p), cfg, camera_name="Camera 1", width=width,
                height=height
            )
    sort_rays = scene.mxu.tri_data.shape[1] > wavefront.SORT_MIN_TRIS

    # Cover the FULL frame (top rows alone are sky): default R is one
    # primary ray per pixel (all standard frame sizes here are multiples
    # of 1024); a smaller requested R strides pixels across the frame —
    # full coverage matters more than block composition for union stats
    # (the large scenes re-sort by the 6-D Morton key anyway).
    pixels = width * height
    if R >= pixels:
        R = pixels
        pix = jnp.arange(R, dtype=jnp.int32)
    else:
        pix = (jnp.arange(R, dtype=jnp.int32) * (pixels // R)).astype(
            jnp.int32
        )
    local = jnp.arange(R, dtype=jnp.int32)
    streams = rng.ray_streams(jnp.uint32(0), local)
    y = (pix // width).astype(jnp.float32)
    x = (pix - (pix // width) * width).astype(jnp.float32)
    jx, jy = rng.uniform2_soa(streams, 0)
    llc = jnp.asarray(cam.lower_left_corner)
    dr = [llc[a] + cam.right[a] * (x + jx) + cam.up[a] * (y + jy)
          for a in range(3)]
    inv_len = 1.0 / jnp.sqrt(dr[0] ** 2 + dr[1] ** 2 + dr[2] ** 2)
    ones = jnp.ones((R,), jnp.float32)
    zeros = jnp.zeros((R,), jnp.float32)
    state = jnp.stack(
        [
            cam.origin[0] * ones, cam.origin[1] * ones, cam.origin[2] * ones,
            dr[0] * inv_len, dr[1] * inv_len, dr[2] * inv_len,
            ones, ones, ones, zeros, zeros, zeros,
            ones, jax.lax.bitcast_convert_type(streams, jnp.float32),
            zeros, zeros,
        ],
        axis=0,
    )

    tri_data = np.asarray(scene.mxu.tri_data)  # (13, Tp) transform bank
    payload: dict[str, np.ndarray] = {
        "tile_bbox": np.asarray(scene.mxu.tile_bbox),
        "tile": np.int32(scene.mxu.tile),
    }
    normal = np.zeros((3, R), np.float32)  # camera rays: no surface yet
    wtile = np.full((R,), -1, np.int32)  # previous bounce's winner tile
    for bounce in range(4):
        if sort_rays:
            perm = jnp.argsort(wavefront._ray_sort_key(scene, state))
            state = jnp.take(state, perm, axis=1)
            perm_np = np.asarray(perm)
            normal = normal[:, perm_np]
            wtile = wtile[perm_np]
        aux, tri, rec = trace_emit_aux(
            scene.mxu, state, rec_table=scene.shade_table_t,
            interpret=interpret,
        )
        st_np = np.asarray(state)
        aux_np = np.asarray(aux)
        payload[f"b{bounce}_od"] = st_np[0:6]
        payload[f"b{bounce}_alive"] = aux_np[4] > 0.0
        payload[f"b{bounce}_t"] = aux_np[2]
        payload[f"b{bounce}_swept"] = aux_np[5]
        payload[f"b{bounce}_normal"] = normal
        payload[f"b{bounce}_prevtile"] = wtile  # -1 on camera rays/misses
        # Winner geometric normal (bank rows 6:9 hold n/|n|^2) becomes the
        # NEXT bounce's origin-surface normal.
        idx = np.asarray(tri[0] if isinstance(tri, (tuple, list)) else tri)
        idx = np.clip(idx.astype(np.int64), 0, tri_data.shape[1] - 1)
        hit_mask = (aux_np[4] > 0.0) & np.isfinite(aux_np[2]) & (
            aux_np[2] < 1e30
        )
        wtile = np.where(
            hit_mask, (idx // int(scene.mxu.tile)).astype(np.int32), -1
        )
        nvec = tri_data[6:9, idx]
        nlen = np.sqrt((nvec**2).sum(axis=0))
        normal = np.where(nlen > 0, nvec / np.maximum(nlen, 1e-30), 0.0)
        normal = normal.astype(np.float32)
        state = shade_fused(scene, state, aux, tri, bounce,
                            block_skip=sort_rays, rec=rec,
                            interpret=interpret)
    np.savez_compressed(out_path, **payload)
    print(f"dumped {R} rays x 4 bounces -> {out_path}")


def simulate(npz_path: str) -> None:
    z = np.load(npz_path)
    bb = z["tile_bbox"].astype(np.float64)  # (6, T)
    lo, hi = bb[0:3], bb[3:6]  # (3, T)
    T = bb.shape[1]
    grans = [1024, 512, 256, 128, 64]
    print(f"tiles={T}  granularities={grans}")
    print("sweep-ops/ray = mean over sub-blocks of union(L) * tile "
          "(tri-lane ops per lane; production = L 512/1024 column)")
    for bounce in range(4):
        od = z[f"b{bounce}_od"].astype(np.float64)  # (6, R)
        alive = z[f"b{bounce}_alive"]
        tfin = z[f"b{bounce}_t"].astype(np.float64)
        nrm = z[f"b{bounce}_normal"].astype(np.float64)  # (3, R)
        swept = z[f"b{bounce}_swept"]
        R = od.shape[1]
        n_alive = int(alive.sum())
        if n_alive == 0:
            print(f"bounce {bounce}: no live rays")
            continue
        tfin = np.where(np.isfinite(tfin), tfin, np.inf)
        have_nrm = (nrm**2).sum(axis=0) > 0.5

        CH = 32 * 1024  # rays per numpy chunk (peak ~(CH, T) f32 arrays)
        uni = {L: 0.0 for L in grans}  # sum over sub-blocks of union size
        uni_hemi = {L: 0.0 for L in grans}
        need_per_ray = 0.0
        lo32 = lo.astype(np.float32)
        hi32 = hi.astype(np.float32)
        for c0 in range(0, R, CH):
            c1 = min(c0 + CH, R)
            o = od[0:3, c0:c1].astype(np.float32)  # (3, C)
            d = od[3:6, c0:c1].astype(np.float32)
            # Slab test against every tile, accumulated per axis to keep
            # the live arrays at (C, T) f32.
            tmin = np.full((c1 - c0, T), -np.inf, np.float32)
            tmax = np.full((c1 - c0, T), np.inf, np.float32)
            fdot = np.zeros((c1 - c0, T), np.float32)  # hemi far-corner dot
            n = nrm[:, c0:c1].astype(np.float32)
            with np.errstate(divide="ignore", invalid="ignore"):
                for a3 in range(3):
                    inv = 1.0 / d[a3]
                    ta = (lo32[a3][None, :] - o[a3][:, None]) * inv[:, None]
                    tb = (hi32[a3][None, :] - o[a3][:, None]) * inv[:, None]
                    tmin = np.maximum(tmin, np.fmin(ta, tb))
                    tmax = np.minimum(tmax, np.fmax(ta, tb))
                    far = np.where(
                        n[a3][:, None] > 0, hi32[a3][None, :],
                        lo32[a3][None, :],
                    )
                    fdot += n[a3][:, None] * far
            a = alive[c0:c1]
            need = (
                (tmin <= np.minimum(tmax, tfin[c0:c1, None].astype(np.float32)))
                & (tmax >= 0.0)
                & a[:, None]
            )
            need_per_ray += float(need.sum())
            # Tangent-hemisphere cull: drop tiles whose box is entirely
            # behind the lane's origin tangent plane (n . (x - o) < 0 for
            # every corner <=> n . (corner picked by sign(n)) < n . o).
            behind = fdot < (n * o).sum(axis=0)[:, None]
            need_h = need & ~(behind & have_nrm[c0:c1, None])
            for L in grans:
                nb = (c1 - c0) // L
                u = need[: nb * L].reshape(nb, L, T).any(axis=1)
                uh = need_h[: nb * L].reshape(nb, L, T).any(axis=1)
                uni[L] += float(u.sum())
                uni_hemi[L] += float(uh.sum())
        mean_swept = float(np.where(alive, swept, 0.0).sum()) / n_alive
        print(
            f"bounce {bounce}: alive {n_alive}/{R}  kernel-swept/ray "
            f"{mean_swept:.2f}  occlusion-ideal need/alive-ray "
            f"{need_per_ray / n_alive:.2f}"
        )
        for L in grans:
            nb = R // L
            # Sweep cost per RAY at granularity L: each sub-block sweeps
            # union tiles over L lanes -> union * tile tri-lane ops / L
            # lanes... per-lane cost = union * tile. Report union and the
            # per-ray op count relative to tiles.
            mu = uni[L] / nb
            mh = uni_hemi[L] / nb
            print(
                f"    L={L:5d}: union/sub-block {mu:7.2f}"
                f"  (+hemi-cull {mh:7.2f})"
                f"  sweep-ops/ray ~ {mu * int(z['tile']):9.0f}"
                f"  ({mh * int(z['tile']):9.0f} with hemi)"
            )


def simulate_leaf(npz_path: str, side: int | None, leaf: int = 64) -> None:
    """Candidate-4 decision gate (docs/NEXT.md): re-bake the scene's
    triangle ORDER with ``leaf``-sized spatial splits (pure host numpy —
    _bvh_order at cap ``leaf`` makes every consecutive leaf chunk AND
    every consecutive pair a real split product), then price, on the same
    dumped waves:

      - tile=128 full sweeps over the new order (baseline, ops = union128 * 128)
      - tile=128 with per-HALF masked sweeps (ops = 64 * halves-needed)
      - tile=64 leaves outright (ops = union64 * 64; ignores the Mosaic
        lane-alignment problem — upper bound for any 64-granular kernel)

    Need criterion per box: slab entry <= min(exit, final best t), exit >= 0
    — identical to simulate()'s occlusion-ideal accounting."""
    import tempfile

    from bench import build_bench_scene, build_large_scene
    from zig_raytracing_contest_tpu.ops.mxu_intersect import _bvh_order
    from zig_raytracing_contest_tpu.scene.geometry import load_geometry
    from zig_raytracing_contest_tpu.scene.gltf import load_gltf

    with tempfile.TemporaryDirectory() as d:
        p = (
            build_large_scene(Path(d) / "s.gltf", side=side)
            if side
            else build_bench_scene(Path(d) / "s.gltf")
        )
        geometry = load_geometry(load_gltf(str(p)))
    pos = geometry.positions.astype(np.float64)  # (T, 3 verts, 3)
    T = pos.shape[0]
    centroid = pos.mean(axis=1)
    order = _bvh_order(centroid, leaf)
    pos = pos[order]

    def chunk_boxes(size):
        n = -(-T // size)
        lo = np.full((3, n), np.inf, np.float32)
        hi = np.full((3, n), -np.inf, np.float32)
        for i in range(n):
            flat = pos[i * size : min((i + 1) * size, T)].reshape(-1, 3)
            lo[:, i] = flat.min(axis=0)
            hi[:, i] = flat.max(axis=0)
        return lo, hi

    lo64, hi64 = chunk_boxes(leaf)
    n64 = lo64.shape[1]
    n128 = -(-n64 // 2)

    z = np.load(npz_path)
    grans = [512, 256, 128]
    print(f"tris={T}  leaves({leaf})={n64}  tiles(128)={n128}")
    for bounce in range(4):
        od = z[f"b{bounce}_od"].astype(np.float64)
        alive = z[f"b{bounce}_alive"]
        tfin = z[f"b{bounce}_t"].astype(np.float64)
        R = od.shape[1]
        n_alive = int(alive.sum())
        if n_alive == 0:
            print(f"bounce {bounce}: no live rays")
            continue
        tfin = np.where(np.isfinite(tfin), tfin, np.inf)

        CH = 32 * 1024
        acc = {L: [0.0, 0.0, 0.0] for L in grans}  # [full128, half, leaf64]
        for c0 in range(0, R, CH):
            c1 = min(c0 + CH, R)
            o = od[0:3, c0:c1].astype(np.float32)
            dvec = od[3:6, c0:c1].astype(np.float32)
            tmin = np.full((c1 - c0, n64), -np.inf, np.float32)
            tmax = np.full((c1 - c0, n64), np.inf, np.float32)
            with np.errstate(divide="ignore", invalid="ignore"):
                for a3 in range(3):
                    inv = 1.0 / dvec[a3]
                    ta = (lo64[a3][None, :] - o[a3][:, None]) * inv[:, None]
                    tb = (hi64[a3][None, :] - o[a3][:, None]) * inv[:, None]
                    tmin = np.maximum(tmin, np.fmin(ta, tb))
                    tmax = np.minimum(tmax, np.fmax(ta, tb))
            a = alive[c0:c1]
            need64 = (
                (tmin <= np.minimum(tmax, tfin[c0:c1, None].astype(np.float32)))
                & (tmax >= 0.0)
                & a[:, None]
            )
            # Pad the leaf axis to an even count for pairing.
            if n64 % 2:
                need64 = np.concatenate(
                    [need64, np.zeros((c1 - c0, 1), bool)], axis=1
                )
            for L in grans:
                nb = (c1 - c0) // L
                u64 = need64[: nb * L].reshape(nb, L, -1).any(axis=1)
                pair = u64.reshape(nb, -1, 2)
                halves = pair.sum(axis=2)  # 0/1/2 needed halves per tile
                acc[L][0] += float((halves > 0).sum()) * 128
                acc[L][1] += float(halves.sum()) * 64
                acc[L][2] += float(u64.sum()) * 64
        print(f"bounce {bounce}: alive {n_alive}/{R}")
        for L in grans:
            nb = R // L
            full, half, l64 = (x / nb for x in acc[L])
            print(
                f"    L={L:4d}: sweep-ops/ray  tile128-full {full:9.0f}"
                f"  tile128-half {half:9.0f} ({half/max(full,1e-9):.2f}x)"
                f"  leaf64 {l64:9.0f} ({l64/max(full,1e-9):.2f}x)"
            )


def simulate_bin(npz_path: str) -> None:
    """Ray-tile binning decision gate (VERDICT r3 item 3).

    The pipeline ALREADY argsorts the wave every bounce (6-D interleaved
    origin+direction Morton key, wavefront._ray_sort_key) — so re-binning
    rays by a tile-aware key costs nothing new on device; the question is
    only whether any implementable key shrinks the per-block cull union
    toward the ~5-tile per-ray ideal.  This prices, on the dumped waves
    (which are stored in PRODUCTION sort order):

      key=asis      the production 6-D Morton order (calibration row)
      key=prevtile  (prev-hit tile id, direction Morton) — the prev-hit
                    tile IS on device at sort time (winner index >> log2
                    tile); tiles are Morton/BVH-ordered at bake, so close
                    ids are close in space — a finer, occupancy-adaptive
                    position code than the 5-bit/axis grid
      key=neartile  (nearest NEEDED tile id, direction Morton) — oracle:
                    needs the trace result it is supposed to accelerate;
                    upper bound for any first-tile binning
      key=needset   greedy need-set ordering: sort by the ray's full
                    needed-tile bitset (lexicographic over the first 8
                    needed ids) — upper bound for set-similarity binning

    Unions are computed exactly like simulate() (occlusion-ideal need:
    slab entry <= min(exit, final best t), exit >= 0, alive lanes only).
    """
    z = np.load(npz_path)
    bb = z["tile_bbox"].astype(np.float64)
    lo32, hi32 = bb[0:3].astype(np.float32), bb[3:6].astype(np.float32)
    T = bb.shape[1]
    tile = int(z["tile"])
    grans = [512, 256, 128]
    print(f"tiles={T}  granularities={grans}  (union/sub-block; lower is "
          f"fewer sweeps — production kernel sweeps the L=512 union)")
    for bounce in range(4):
        od = z[f"b{bounce}_od"].astype(np.float32)
        alive = z[f"b{bounce}_alive"]
        tfin = z[f"b{bounce}_t"].astype(np.float64)
        if f"b{bounce}_prevtile" not in z.files:
            print("dump has no prevtile rows — re-dump with this script")
            return
        ptile = z[f"b{bounce}_prevtile"]
        R = od.shape[1]
        n_alive = int(alive.sum())
        if n_alive == 0:
            print(f"bounce {bounce}: no live rays")
            continue
        tfin = np.where(np.isfinite(tfin), tfin, np.inf).astype(np.float32)

        # Full need matrix (R, T) as packed bits to bound memory
        # (2^18 * 785 bools = 205 MB; fine as bool for these R).
        need = np.zeros((R, T), bool)
        tentry = np.zeros((R, T), np.float32)
        CH = 32 * 1024
        for c0 in range(0, R, CH):
            c1 = min(c0 + CH, R)
            o = od[0:3, c0:c1]
            d = od[3:6, c0:c1]
            tmin = np.full((c1 - c0, T), -np.inf, np.float32)
            tmax = np.full((c1 - c0, T), np.inf, np.float32)
            with np.errstate(divide="ignore", invalid="ignore"):
                for a3 in range(3):
                    inv = 1.0 / d[a3]
                    ta = (lo32[a3][None, :] - o[a3][:, None]) * inv[:, None]
                    tb = (hi32[a3][None, :] - o[a3][:, None]) * inv[:, None]
                    tmin = np.maximum(tmin, np.fmin(ta, tb))
                    tmax = np.minimum(tmax, np.fmax(ta, tb))
            need[c0:c1] = (
                (tmin <= np.minimum(tmax, tfin[c0:c1, None]))
                & (tmax >= 0.0)
                & alive[c0:c1, None]
            )
            tentry[c0:c1] = np.where(need[c0:c1], tmin, np.inf)

        # Direction Morton bits (3 bits/axis like the production key tail).
        d = od[3:6]
        db = ((d + 1.0) * 3.9999).astype(np.int64)  # 0..7 per axis
        dmort = np.zeros(R, np.int64)
        for b in range(3):
            for a3 in range(3):
                dmort |= ((db[a3] >> b) & 1) << (3 * b + a3)

        # Implementable corridor key: quantized origin + quantized point
        # where the ray EXITS the scene bbox (ONE slab test per ray — no
        # tile knowledge, no trace result).  Proxy for nearfar: rays
        # sharing both corridor endpoints share ~their whole tile list.
        slo = lo32.min(axis=1)
        shi = hi32.max(axis=1)
        span = np.maximum(shi - slo, 1e-30)
        o = od[0:3]
        with np.errstate(divide="ignore", invalid="ignore"):
            inv = 1.0 / d
            ta = (slo[:, None] - o) * inv
            tb = (shi[:, None] - o) * inv
            texit = np.minimum(
                np.minimum(np.fmax(ta[0], tb[0]), np.fmax(ta[1], tb[1])),
                np.fmax(ta[2], tb[2]),
            )
        ex = o + d * np.maximum(texit, 0.0)[None, :]
        B = 5

        def mort3(p, bits):
            q = np.clip(
                ((p - slo[:, None]) / span[:, None]) * (1 << bits),
                0, (1 << bits) - 1,
            ).astype(np.int64)
            m = np.zeros(p.shape[1], np.int64)
            for b in range(bits):
                for a3 in range(3):
                    m |= ((q[a3] >> b) & 1) << (3 * b + a3)
            return m

        omort = mort3(o, B)

        def mix_with_exit(tcap):
            exc = o + d * np.minimum(np.maximum(texit, 0.0), tcap)[None, :]
            em = mort3(exc, B)
            m = np.zeros(R, np.int64)
            # interleave origin/exit Morton groups 3 bits at a time so
            # blocks are compact in BOTH endpoints at every scale
            for g in range(B):
                m |= ((omort >> (3 * g)) & 7) << (6 * g + 3)
                m |= ((em >> (3 * g)) & 7) << (6 * g)
            return m

        diag = float(np.sqrt((span**2).sum()))
        ex = o + d * np.maximum(texit, 0.0)[None, :]
        emort = mort3(ex, B)
        oemix = mix_with_exit(np.inf)

        near = np.where(
            need.any(axis=1), np.argmin(tentry, axis=1), T
        ).astype(np.int64)
        tentry_neg = np.where(np.isfinite(tentry), tentry, -np.inf)
        far = np.where(
            need.any(axis=1), np.argmax(tentry_neg, axis=1), T
        ).astype(np.int64)
        # first min(8, T) needed tile ids per ray (top-k by entry t)
        k8 = min(8, T)
        order8 = np.argsort(tentry, axis=1)[:, :k8]
        got = np.take_along_axis(tentry, order8, axis=1) < np.inf
        first8 = np.where(got, order8, T)

        keys = {
            "asis": np.arange(R, dtype=np.int64),
            "prevtile": (
                (np.where(ptile < 0, T, ptile).astype(np.int64) << 32)
                | (dmort << 16)
            ),
            "neartile": (near << 32) | (dmort << 16),
            # corridor extent: rays sharing BOTH the nearest and farthest
            # needed tile share ~their whole tile list (oracle variant —
            # 'far' needs the trace, but prev-bounce far is conceivable)
            "nearfar": (near << 32) | (far << 16) | dmort,
            # direction-major: opposite extreme of the 6-D interleave
            "dirmajor": (
                (dmort << 48)
                | (np.where(ptile < 0, T, ptile).astype(np.int64) << 16)
            ),
            # implementable corridor keys (one scene-bbox slab test/ray)
            "exitpt": (omort << 18) | (emort << 3),
            "oemix": oemix,
            # occlusion proxy: clamp the corridor endpoint at a fixed
            # fraction of the scene diagonal (static bake constant)
            "oemix1/8": mix_with_exit(diag / 8),
            "oemix1/4": mix_with_exit(diag / 4),
            "oemix1/2": mix_with_exit(diag / 2),
            "needset": None,  # lexsort below
        }
        dead_last = (~alive).astype(np.int64) << 62
        print(f"bounce {bounce}: alive {n_alive}/{R}")
        for kname, key in keys.items():
            if kname == "needset":
                perm = np.lexsort(
                    tuple(first8[:, k] for k in range(k8 - 1, -1, -1))
                    + (dead_last,)
                )
            else:
                perm = np.argsort(key + dead_last, kind="stable")
            nd = need[perm]
            row = f"    {kname:9s}:"
            for L in grans:
                nb = R // L
                u = nd[: nb * L].reshape(nb, L, T).any(axis=1)
                row += f"  L={L} union {u.sum() / nb:7.2f}"
            print(row)


def simulate_resort(npz_path: str) -> None:
    """Round-5 decision gate (r4 VERDICT item 3): price the two bounce>=2
    union-headroom candidates on the dumped waves.

    Candidate (a) — two-pass 'coarse pre-pass -> re-sort by observed need
    -> fine trace'.  The only *implementable* observed-need signature that
    does not require the trace result it is supposed to accelerate is the
    UNOCCLUDED need-set: after shade scatters bounce b+1's ray in-kernel,
    a slab-only pre-pass (785 tile slabs ~ 7.9k ops/lane ~ 2.3 tile-sweeps
    of VPU work) can emit the first-k needed tile ids with NO best-t cap
    (best t is what the fine trace will compute).  Keys priced:

      needset        occlusion-ideal oracle (r4 row, for reference)
      unocc-needset  lexsort by first-8 unoccluded needed tiles
      unocc-cap1/4   same, entry capped at diag/4 (static occlusion proxy)
      unocc-cap1/8   same at diag/8
      grp-needset    lexsort by first-8 unoccluded needed GROUPS (8-tile
                     slab pre-pass, 1/8 the pre-pass cost)
      asis / oemix   calibration rows (production order / shipped key)

    Candidate (b) — per-lane stack traversal at bounce>=2.  Not directly
    sortable; its cost is divergence-bound: a vectorized while-stack runs
    until every lane in the block finishes, so steps/block = MAX over
    lanes of per-lane visits, and each per-lane tile sweep needs a
    lane-varying gather of 128x13 tri rows (Mosaic has no multi-vreg
    dynamic gather — the texel-LUT dead end — so the only lowering is a
    one-hot matmul over ALL tiles, (L, T) x (T, 128*13) per step).  This
    prints the max/mean per-lane need per block, from which the go/no-go
    arithmetic in docs/ROUND5.md follows.
    """
    z = np.load(npz_path)
    bb = z["tile_bbox"].astype(np.float64)
    lo32, hi32 = bb[0:3].astype(np.float32), bb[3:6].astype(np.float32)
    T = bb.shape[1]
    grans = [512, 256]
    slo = lo32.min(axis=1)
    shi = hi32.max(axis=1)
    span = np.maximum(shi - slo, 1e-30)
    diag = float(np.sqrt((span**2).sum()))
    # group = 8 consecutive tiles (bake order); group bbox = union
    G = (T + 7) // 8
    glo = np.full((3, G), np.inf, np.float32)
    ghi = np.full((3, G), -np.inf, np.float32)
    for g in range(G):
        s = slice(g * 8, min((g + 1) * 8, T))
        glo[:, g] = lo32[:, s].min(axis=1)
        ghi[:, g] = hi32[:, s].max(axis=1)
    print(f"tiles={T} groups={G} grans={grans}")
    for bounce in range(1, 4):
        od = z[f"b{bounce}_od"].astype(np.float32)
        alive = z[f"b{bounce}_alive"]
        tfin = z[f"b{bounce}_t"].astype(np.float64)
        R = od.shape[1]
        n_alive = int(alive.sum())
        if n_alive == 0:
            print(f"bounce {bounce}: no live rays")
            continue
        tfin = np.where(np.isfinite(tfin), tfin, np.inf).astype(np.float32)

        def entries(lo_, hi_, occl_cap):
            """per-(ray, box) slab entry where needed else +inf"""
            nbox = lo_.shape[1]
            ten = np.zeros((R, nbox), np.float32)
            CH = 32 * 1024
            for c0 in range(0, R, CH):
                c1 = min(c0 + CH, R)
                o = od[0:3, c0:c1]
                d = od[3:6, c0:c1]
                tmin = np.full((c1 - c0, nbox), -np.inf, np.float32)
                tmax = np.full((c1 - c0, nbox), np.inf, np.float32)
                with np.errstate(divide="ignore", invalid="ignore"):
                    for a3 in range(3):
                        inv = 1.0 / d[a3]
                        ta = (lo_[a3][None, :] - o[a3][:, None]) * inv[:, None]
                        tb = (hi_[a3][None, :] - o[a3][:, None]) * inv[:, None]
                        tmin = np.maximum(tmin, np.fmin(ta, tb))
                        tmax = np.minimum(tmax, np.fmax(ta, tb))
                cap = (
                    tfin[c0:c1, None]
                    if occl_cap is None
                    else np.float32(occl_cap)
                )
                nd = (
                    (tmin <= np.minimum(tmax, cap))
                    & (tmax >= 0.0)
                    & alive[c0:c1, None]
                )
                ten[c0:c1] = np.where(nd, tmin, np.inf)
            return ten

        ten_true = entries(lo32, hi32, None)  # occlusion-ideal (oracle)
        need_true = ten_true < np.inf

        def first8(ten):
            k8 = min(8, ten.shape[1])
            o8 = np.argsort(ten, axis=1)[:, :k8]
            got = np.take_along_axis(ten, o8, axis=1) < np.inf
            return np.where(got, o8, ten.shape[1])

        dead_last = (~alive).astype(np.int64) << 62

        def lex(f8):
            return np.lexsort(
                tuple(f8[:, k] for k in range(f8.shape[1] - 1, -1, -1))
                + (dead_last,)
            )

        perms = {"asis": np.arange(R)}
        perms["needset"] = lex(first8(ten_true))
        ten_un = entries(lo32, hi32, np.inf)
        perms["unocc-needset"] = lex(first8(ten_un))
        perms["unocc-cap1/4"] = lex(first8(entries(lo32, hi32, diag / 4)))
        perms["unocc-cap1/8"] = lex(first8(entries(lo32, hi32, diag / 8)))
        perms["grp-needset"] = lex(first8(entries(glo, ghi, np.inf)))
        # The int32-budget truncations the real sort key can carry
        # (wavefront._mid_sort_key): first-3 unoccluded ids at
        # ceil(log2(T+1)) bits each + corridor-Morton tiebreak in the
        # leftover low bits.
        f8 = first8(ten_un)
        Bq = max(int(np.ceil(np.log2(T + 1))), 1)
        o = od[0:3]
        d = od[3:6]
        with np.errstate(divide="ignore", invalid="ignore"):
            inv = 1.0 / d
            ta = (slo[:, None] - o) * inv
            tb = (shi[:, None] - o) * inv
            texit = np.minimum(
                np.minimum(np.fmax(ta[0], tb[0]), np.fmax(ta[1], tb[1])),
                np.fmax(ta[2], tb[2]),
            )
        ex = o + d * np.maximum(texit, 0.0)[None, :]

        def mort3(p, bits):
            q = np.clip(((p - slo[:, None]) / span[:, None]) * (1 << bits),
                        0, (1 << bits) - 1).astype(np.int64)
            m = np.zeros(p.shape[1], np.int64)
            for b in range(bits):
                for a3 in range(3):
                    m |= ((q[a3] >> b) & 1) << (3 * b + a3)
            return m

        omort, emort = mort3(o, 5), mort3(ex, 5)
        oemix = np.zeros(R, np.int64)
        for g in range(5):
            oemix |= ((omort >> (3 * g)) & 7) << (6 * g + 3)
            oemix |= ((emort >> (3 * g)) & 7) << (6 * g)
        for k in (2, 3):
            kk = np.zeros(R, np.int64)
            for j in range(k):
                kk = (kk << Bq) | f8[:, j].astype(np.int64)
            tail = max(30 - k * Bq, 0)
            perms[f"first{k}+mix"] = np.argsort(
                (kk << tail) | (oemix >> max(30 - tail, 0)) | dead_last,
                kind="stable",
            )
        print(f"bounce {bounce}: alive {n_alive}/{R}  "
              f"need/alive-ray {need_true.sum() / n_alive:.2f}")
        for kname, perm in perms.items():
            nd = need_true[perm]
            row = f"    {kname:14s}:"
            for L in grans:
                nb = R // L
                u = nd[: nb * L].reshape(nb, L, T).any(axis=1)
                row += f"  L={L} union {u.sum() / nb:7.2f}"
            print(row)
        # candidate (b): divergence stats at production order, L=512
        L = 512
        nb = R // L
        cnt = need_true[: nb * L].sum(axis=1).reshape(nb, L)
        blk_alive = alive[: nb * L].reshape(nb, L).any(axis=1)
        mx = cnt.max(axis=1)[blk_alive]
        mn = cnt.mean(axis=1)[blk_alive]
        print(f"    per-lane need, live L=512 blocks: mean {mn.mean():.2f} "
              f"max/block mean {mx.mean():.1f} p95 "
              f"{np.percentile(mx, 95):.0f} (while-stack steps/block ~ "
              f"2x max; one-hot sweep (512,{T})x({T},1664) per step)")


def main() -> int:
    side = None
    R = 1 << 18
    leaf = 64
    for a in sys.argv[1:]:
        if a.startswith("--side="):
            side = int(a.split("=")[1])
        if a.startswith("--R="):
            R = int(a.split("=")[1], 0)
        if a.startswith("--leaf="):
            leaf = int(a.split("=")[1])
    if "--dump" in sys.argv:
        out = sys.argv[sys.argv.index("--dump") + 1]
        dump(out, side, R, interpret="--interpret" in sys.argv,
             sponza="--sponza" in sys.argv)
        return 0
    if "--sim64" in sys.argv:
        simulate_leaf(sys.argv[sys.argv.index("--sim64") + 1], side, leaf)
        return 0
    if "--simbin" in sys.argv:
        simulate_bin(sys.argv[sys.argv.index("--simbin") + 1])
        return 0
    if "--simresort" in sys.argv:
        simulate_resort(sys.argv[sys.argv.index("--simresort") + 1])
        return 0
    if "--sim" in sys.argv:
        simulate(sys.argv[sys.argv.index("--sim") + 1])
        return 0
    print(__doc__)
    return 1


if __name__ == "__main__":
    sys.exit(main())
