"""On-chip golden gate (VERDICT r2 next-round item 7).

Renders the golden assets at 64 spp ON THE REAL TPU and asserts agreement
with the committed CPU-rendered goldens, with bounds that reflect what the
reference's semantics actually guarantee:

* ``duckish`` (opaque, textured): CPU and TPU trajectories are identical up
  to ULP-level FMA contraction, so the converged image must match tightly
  (mean |diff| < 1/255).

* ``alpha_modes`` (stochastic alpha): EXACT agreement is impossible *by the
  reference's own construction*.  The alpha pass-through re-originates the
  ray at ``ray.at(hit.t + floatEps(f32))`` (/root/reference/src/stage3.zig:209,
  which we mirror) — an ABSOLUTE nudge of 1.19e-7 that is a rounding no-op
  once t >= 2 (ULP(2) = 2.4e-7).  Whether the re-trace phantom-re-hits the
  same triangle at t ~ 0 is therefore decided by backend rounding: measured
  on this asset, XLA:CPU re-hits 1085/1957 pass-throughs, the TPU path 536.
  Each phantom re-hit burns a bounce and an extra RNG draw, so trajectories
  in alpha-tested regions decorrelate completely between backends — two
  compiles of the reference itself (different FMA/SIMD contraction) would
  diverge the same way.  What IS guaranteed, and what this gate asserts:

    1. OUTSIDE the stochastic-alpha region the render is bit-stable across
       backends (measured bit-exact on v5e): near-exact bound.
    2. INSIDE the region the TPU render must sit within the stochastic
       envelope: mean |diff| <= 1.5x the CPU seed-to-seed noise floor at
       64 spp, and the signed bias (phantom-re-hit rate difference) must
       stay below the noise floor itself.

  The region mask and the noise floor are not magic constants: they are
  recomputed at gate time from TWO committed CPU goldens of the same scene
  under different seeds (golden64_alpha_modes.png seed 12345,
  golden64_alpha_modes_s777.png seed 777; produced by
  scripts/make_golden64.py on the jax CPU backend).

Run from the repo root on a TPU host:

    python scripts/golden_tpu.py

Exit code 0 = gate passed.  Record the run in PROGRESS.jsonl / docs.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np
from PIL import Image

from zig_raytracing_contest_tpu.config import Config
from zig_raytracing_contest_tpu.render.pipeline import prepare_scene, render_scene

ASSETS = Path(__file__).resolve().parent.parent / "tests" / "assets"

OPAQUE_MEAN_BOUND = 1.0   # u8 units; r2/r3 measured ~0.1-0.3 on duckish
NOISE_MULT = 1.5          # alpha region: allowed multiple of the seed floor
EXACT_MEAN_BOUND = 0.05   # outside the stochastic mask
EXACT_MAX_BOUND = 8       # isolated mask-dilation stragglers only


def _dilate(mask: np.ndarray, r: int = 2) -> np.ndarray:
    """Binary dilation with a (2r+1)^2 box, pure numpy (no edge wrap)."""
    out = mask.copy()
    for axis in (0, 1):
        acc = out.copy()
        padded = np.pad(out, [(r, r) if a == axis else (0, 0)
                              for a in range(out.ndim)])
        for shift in range(1, r + 1):
            for off in (r - shift, r + shift):
                sl = [slice(None)] * out.ndim
                sl[axis] = slice(off, off + out.shape[axis])
                acc |= padded[tuple(sl)]
        out = acc
    return out


def _render(name: str, seed: int, **kw) -> np.ndarray:
    cfg = Config(grid_resolution=(16, 16, 16), num_samples=64, max_bounce=3,
                 seed=seed)
    scene, cam, _ = prepare_scene(str(ASSETS / f"{name}.gltf"), cfg, **kw)
    img, _ = render_scene(scene, cam, cfg)
    return img.astype(int)


def main() -> int:
    backend = jax.default_backend()
    if backend not in ("tpu", "axon"):
        print(f"ERROR: need a TPU backend, got {backend!r}", file=sys.stderr)
        return 2
    failures = 0

    # --- duckish: opaque, trajectories match up to FMA ULPs -> tight bound.
    img = _render("duckish", 12345, height=96)
    ref = np.asarray(Image.open(ASSETS / "golden64_duckish.png")).astype(int)
    mean = np.abs(img - ref).mean()
    ok = mean < OPAQUE_MEAN_BOUND
    failures += not ok
    print(f"duckish: mean |diff| {mean:.3f}/255 (bound {OPAQUE_MEAN_BOUND}) "
          f"-> {'PASS' if ok else 'FAIL'}")

    # --- alpha_modes: region-aware statistical gate.
    ref_a = np.asarray(
        Image.open(ASSETS / "golden64_alpha_modes.png")).astype(int)
    ref_b = np.asarray(
        Image.open(ASSETS / "golden64_alpha_modes_s777.png")).astype(int)
    seed_diff = np.abs(ref_a - ref_b)
    mask = _dilate(seed_diff.sum(axis=-1) > 0)          # stochastic region
    nmask = ~mask
    region = mask.mean()
    floor = seed_diff[mask].mean()                       # CPU seed-to-seed
    img = _render("alpha_modes", 12345, width=128, height=96)
    diff = img - ref_a
    adiff = np.abs(diff)

    out_mean = adiff[nmask].mean() if nmask.any() else 0.0
    out_max = adiff[nmask].max() if nmask.any() else 0
    in_mean = adiff[mask].mean()
    in_bias = diff[mask].mean()
    ok_out = out_mean <= EXACT_MEAN_BOUND and out_max <= EXACT_MAX_BOUND
    ok_in = in_mean <= NOISE_MULT * floor and abs(in_bias) <= floor
    failures += not (ok_out and ok_in)
    print(f"alpha_modes: stochastic region {region:.1%}, CPU seed floor "
          f"{floor:.2f}/255")
    print(f"  outside region: mean {out_mean:.4f} (bound {EXACT_MEAN_BOUND}),"
          f" max {out_max} (bound {EXACT_MAX_BOUND}) -> "
          f"{'PASS' if ok_out else 'FAIL'}")
    print(f"  inside region:  mean {in_mean:.2f} (bound "
          f"{NOISE_MULT * floor:.2f}), signed bias {in_bias:+.2f} (bound "
          f"+/-{floor:.2f}) -> {'PASS' if ok_in else 'FAIL'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
