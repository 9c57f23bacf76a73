"""On-chip golden gate (VERDICT r2 next-round item 7).

Renders the golden assets at 64 spp ON THE REAL TPU and asserts the
statistical bound measured in round 2: TPU (Mosaic/fused) vs XLA:CPU
renders of the same scene agree to mean |diff| < 1/255 at 64 spp — the
ULP-level FMA-contraction differences between backends flip individual
stochastic-alpha samples (noise) but do not bias the converged image.

The CPU side is pre-rendered and committed (tests/assets/golden64_*.png,
produced by num_samples=64 renders on the jax CPU backend — see
tests/test_golden.py for why CPU is the pinned oracle), so this script
only needs the chip.  Run from the repo root on a TPU host:

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

CASES = {
    "duckish": dict(height=96),
    "alpha_modes": dict(width=128, height=96),
}

MEAN_BOUND = 1.0  # mean |diff| < 1/255 in u8 units (r2 measured 0.33)


def main() -> int:
    backend = jax.default_backend()
    if backend not in ("tpu", "axon"):
        print(f"ERROR: need a TPU backend, got {backend!r}", file=sys.stderr)
        return 2
    failures = 0
    for name, kw in CASES.items():
        cfg = Config(
            grid_resolution=(16, 16, 16), num_samples=64, max_bounce=3,
            seed=12345,
        )
        scene, cam, _ = prepare_scene(str(ASSETS / f"{name}.gltf"), cfg, **kw)
        img, _ = render_scene(scene, cam, cfg)
        ref = np.asarray(Image.open(ASSETS / f"golden64_{name}.png"))
        diff = np.abs(img.astype(int) - ref.astype(int))
        mean = diff.mean()
        flipped = (diff > 3).mean()
        ok = mean < MEAN_BOUND
        failures += not ok
        print(
            f"{name}: mean |diff| {mean:.3f}/255 (bound {MEAN_BOUND}), "
            f"pixels >3: {flipped:.2%} -> {'PASS' if ok else 'FAIL'}"
        )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
