"""On-chip localizer for the paged texel fetch (render/fused._fetch_paged).

The round-3 on-chip golden gate failed on alpha_modes (mean |diff|
5.96/255) while duckish passed — alpha_modes is the only golden whose
texel bank exceeds ONEHOT_MAX_TEXELS and therefore takes the NEW paged
fetch path.  All paged tests run in interpret mode (tests/test_fused.py),
so a Mosaic-vs-interpret divergence in _fetch_paged would show exactly
this signature.

This drives _fetch_paged directly through a minimal pallas_call on the
real chip and compares against interpret mode on identical inputs:
every texel index as base (multi-chunk, multi-page, dead lanes mixed in),
for both the VMEM-resident branch and the HBM-streamed branch.

Run on a TPU host:  python scripts/check_paged_tpu.py
Exit 0 = compiled fetch matches interpret everywhere.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zig_raytracing_contest_tpu.render import fused
from zig_raytracing_contest_tpu.scene.types import (
    PAGE_TEXELS,
    _pack_paged_bank,
)


def make_bank(n_tex_texels: int, seed: int = 0):
    """A synthetic multi-texture bank: one wrapping texture covering most
    texels plus 1x1 dummies, mimicking a real scene's bank layout."""
    rng = np.random.default_rng(seed)
    w = 32
    h = max(1, n_tex_texels // w)
    tex = rng.integers(0, 1 << 16, size=(h * w, 4)).astype(np.uint16)
    # desc rows: [offset, w, h, u_min, u_max, v_min, v_max] int32 — repeat
    # is the full int32 range, clamp a finite texel range
    # (scene/materials.py DESC_* columns, _paged_corner_maps).
    from zig_raytracing_contest_tpu.scene.materials import (
        DESC_COLS,
        INT32_MAX,
        INT32_MIN,
    )

    desc = np.zeros((1, DESC_COLS), np.int64)
    desc[0] = [0, w, h, INT32_MIN, INT32_MAX, 0, h - 1]
    return _pack_paged_bank(tex, desc), tex


def run_fetch(bank, idx, demand, interpret: bool, force_hbm: bool):
    B = idx.shape[0]
    rows = bank.shape[0]

    old = fused.PAGED_VMEM_MAX_BYTES
    if force_hbm:
        fused.PAGED_VMEM_MAX_BYTES = 0
    try:
        hbm = fused._bank_hbm(bank.shape)

        def kernel(bank_ref, idx_ref, demand_ref, out_ref):
            res = fused._fetch_paged(
                bank_ref, [idx_ref[0, :]], demand_ref[0, :] != 0
            )[0]
            out_ref[:, :] = res

        out = pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec(
                    bank.shape,
                    lambda: (0, 0),
                    memory_space=pl.ANY if hbm else pltpu.VMEM,
                ),
                pl.BlockSpec((1, B), lambda: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B), lambda: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (16, B), lambda: (0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((16, B), jnp.float32),
            interpret=interpret,
        )(bank, idx.reshape(1, B), demand.reshape(1, B).astype(jnp.int32))
        return np.asarray(jax.block_until_ready(out))
    finally:
        fused.PAGED_VMEM_MAX_BYTES = old


def main() -> int:
    if jax.default_backend() not in ("tpu", "axon"):
        print("ERROR: need a TPU backend", file=sys.stderr)
        return 2

    failures = 0
    for n_texels, label in [(1024 + 64, "alpha_modes-class (1.06k texels)"),
                            (3 * PAGE_TEXELS // 2, "3k texels, 2 pages"),
                            (5 * PAGE_TEXELS, "10k texels, 5 pages")]:
        bank, tex = make_bank(n_texels)
        P = tex.shape[0]
        B = 1024
        rng = np.random.default_rng(7)
        cases = {
            "sequential": np.arange(B, dtype=np.int32) % P,
            "random": rng.integers(0, P, B).astype(np.int32),
            "page-straddle": (np.arange(B, dtype=np.int32) * 37) % P,
        }
        for cname, idx_np in cases.items():
            demand_np = np.ones(B, bool)
            demand_np[::7] = False  # mixed dead lanes
            idx = jnp.asarray(idx_np)
            demand = jnp.asarray(demand_np)
            for force_hbm in (False, True):
                want = run_fetch(bank, idx, demand, True, force_hbm)
                got = run_fetch(bank, idx, demand, False, force_hbm)
                bad = (want != got) & demand_np[None, :]
                tag = (f"{label} / {cname} / "
                       f"{'hbm' if force_hbm else 'vmem'}")
                if bad.any():
                    failures += 1
                    r, c = np.argwhere(bad)[0]
                    print(f"FAIL {tag}: {bad.sum()} mismatches; first at "
                          f"row {r} lane {c} idx {idx_np[c]}: "
                          f"want {want[r, c]} got {got[r, c]}")
                else:
                    print(f"PASS {tag}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
