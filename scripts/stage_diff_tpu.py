"""Per-stage compiled-vs-interpret localizer for the alpha_modes on-chip
golden failure (round 3).

golden_bisect.py showed every round-3 feature innocent — the per-bounce
pipeline diverges on chip with or without the paged bank, so the bug is in
the SHARED path: trace_emit_aux or shade_fused compiled by Mosaic.

For each bounce this feeds the same interpret-produced state into both the
compiled and interpret variants of each stage and reports:
  - tri id mismatches (gross traversal divergence),
  - u/v/t max |diff| and count > 1e-5 (precision divergence),
  - rec row max |diff|,
  - shade output state rows max |diff| given IDENTICAL trace inputs.

Run on a TPU host:  python scripts/stage_diff_tpu.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from zig_raytracing_contest_tpu.config import Config
from zig_raytracing_contest_tpu.ops import rng
from zig_raytracing_contest_tpu.ops.mxu_intersect import trace_emit_aux
from zig_raytracing_contest_tpu.render import wavefront as wf
from zig_raytracing_contest_tpu.render.fused import shade_fused
from zig_raytracing_contest_tpu.render.pipeline import prepare_scene

ASSETS = Path(__file__).resolve().parent.parent / "tests" / "assets"


def summarize(name, a, b, rows=None):
    a = np.asarray(a)
    b = np.asarray(b)
    if a.size == 0:
        return
    if a.ndim == 1:
        n = int((a != b).sum())
        print(f"  {name}: mismatches {n}/{a.size}"
              + (f"  first at {np.argwhere(a != b)[0]}" if n else ""))
        return
    af = np.isfinite(a)
    bf = np.isfinite(b)
    fin_mismatch = af != bf
    # non-finite on both sides but unequal bit patterns (inf vs nan, ±inf)
    nf_both = ~af & ~bf
    nf_neq = nf_both & (a != b) & ~(np.isnan(a) & np.isnan(b))
    both = af & bf
    d = np.where(both, np.abs(a.astype(np.float64) - b.astype(np.float64)),
                 0.0)
    worst = float(d.max())
    nbad = int((d > 1e-5).sum())
    nfm = int(fin_mismatch.sum())
    nfe = int(nf_neq.sum())
    tag = "" if (worst < 1e-5 and not nfm and not nfe) else "  <-- DIVERGES"
    print(f"  {name}: finite max|diff| {worst:.3e}  elts>1e-5: {nbad}  "
          f"finiteness-mismatch: {nfm}  nonfinite-unequal: {nfe}{tag}")
    mx = d.max(axis=1)
    if rows is not None:
        for r in range(a.shape[0]):
            bad = mx[r] > 1e-5 or fin_mismatch[r].any() or nf_neq[r].any()
            if bad:
                where = np.argwhere(fin_mismatch[r])[:3].ravel().tolist()
                print(f"    row {r} ({rows[r] if r < len(rows) else '?'}):"
                      f" max {mx[r]:.3e}  fin-mm"
                      f" {int(fin_mismatch[r].sum())} at {where}  nf-neq"
                      f" {int(nf_neq[r].sum())}")


def main() -> int:
    cfg = Config(grid_resolution=(16, 16, 16), num_samples=4, max_bounce=3,
                 seed=12345)
    scene, cam, _ = prepare_scene(str(ASSETS / "alpha_modes.gltf"), cfg,
                                  width=128, height=96)
    spp, width = cfg.num_samples, 128
    R = 128 * 96 * spp  # one wave, 49152 rays

    local = jnp.arange(R, dtype=jnp.int32)
    streams = rng.ray_streams(jnp.uint32(cfg.seed), local)
    pixel, x, y = wf.wave_pixel_coords(local, spp, width, jnp.int32(0))
    jx, jy = rng.uniform2_soa(streams, 0)
    sx, sy = x + jx, y + jy
    co = np.asarray(cam.origin, np.float32)
    dr = [
        np.float32(cam.lower_left_corner[a])
        + np.float32(cam.right[a]) * sx
        + np.float32(cam.up[a]) * sy
        for a in range(3)
    ]
    inv_len = 1.0 / jnp.sqrt(dr[0] * dr[0] + dr[1] * dr[1] + dr[2] * dr[2])
    ones = jnp.ones((R,), jnp.float32)
    zeros = jnp.zeros((R,), jnp.float32)
    state = jnp.stack(
        [co[0] * ones, co[1] * ones, co[2] * ones,
         dr[0] * inv_len, dr[1] * inv_len, dr[2] * inv_len,
         ones, ones, ones, zeros, zeros, zeros, ones,
         jax.lax.bitcast_convert_type(streams, jnp.float32),
         zeros, zeros], axis=0)

    aux_rows = ["u", "v", "t", "streams", "alive", "r5", "r6", "r7"]
    state_rows = ["ox", "oy", "oz", "dx", "dy", "dz", "tpx", "tpy", "tpz",
                  "radx", "rady", "radz", "alive", "streams", "seg", "pad"]

    for bounce in range(cfg.max_bounce):
        origin = jnp.asarray(co) if bounce == 0 else None
        print(f"== bounce {bounce}", flush=True)
        aux_i, tri_i, rec_i = trace_emit_aux(
            scene.mxu, state, rec_table=scene.shade_table_t,
            interpret=True, origin=origin)
        aux_c, tri_c, rec_c = trace_emit_aux(
            scene.mxu, state, rec_table=scene.shade_table_t,
            interpret=False, origin=origin)
        jax.block_until_ready(aux_c)
        summarize("tri", tri_i, tri_c)
        summarize("aux", aux_i, aux_c, aux_rows)
        if rec_i is not None:
            summarize("rec", rec_i, rec_c)

        st_i = shade_fused(scene, state, aux_i, tri_i, bounce,
                           interpret=True, rec=rec_i)
        st_c = shade_fused(scene, state, aux_i, tri_i, bounce,
                           interpret=False, rec=rec_i)
        jax.block_until_ready(st_c)
        summarize("shade(state')", st_i, st_c, state_rows)
        state = st_i  # advance along the interpret trajectory
    return 0


if __name__ == "__main__":
    sys.exit(main())
