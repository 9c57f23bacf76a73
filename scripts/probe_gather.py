"""Probe: does Mosaic lower jnp.take_along_axis (tpu.dynamic_gather) on
(8, 128) i32 tiles inside a Pallas kernel on this chip, and how fast?

The paged texel fetch (render/fused.py) composes two same-shape gathers:
axis=1 moves each lane's target COLUMN into that lane, axis=0 then picks
the ROW — together an arbitrary per-lane 2-D fetch from an (8, 128) page.

Run: python scripts/probe_gather.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(page_ref, col_ref, row_ref, out_ref, reps: int):
    pg = page_ref[:, :]
    col = col_ref[:, :]
    row = row_ref[:, :]
    acc = jnp.zeros(pg.shape, jnp.int32)
    for r in range(reps):
        z = jnp.take_along_axis(pg + r, col, axis=1)
        w = jnp.take_along_axis(z, row, axis=0)
        acc = acc + w
    out_ref[:, :] = acc


def run(reps):
    pg = jnp.asarray(np.arange(8 * 128, dtype=np.int32).reshape(8, 128))
    rng = np.random.default_rng(0)
    col = jnp.asarray(rng.integers(0, 128, (8, 128), dtype=np.int32))
    row = jnp.asarray(rng.integers(0, 8, (8, 128), dtype=np.int32))
    f = pl.pallas_call(
        lambda a, b, c, o: kernel(a, b, c, o, reps),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = np.asarray(jax.jit(f)(pg, col, row))
    # Expected: sum over r of pg[row[s,l], col[row? ...]] — careful:
    # z[s, l] = pg[s, col[s, l]] + r ; w[s, l] = z[row[s, l], l]
    #         = pg[row[s,l], col[row[s,l], l]] + r
    npg = np.asarray(pg)
    ncol = np.asarray(col)
    nrow = np.asarray(row)
    exp = np.zeros((8, 128), np.int64)
    for s in range(8):
        for l in range(128):
            r0 = nrow[s, l]
            exp[s, l] = npg[r0, ncol[r0, l]]
    exp = exp * reps + sum(range(reps))
    ok = np.array_equal(out.astype(np.int64), exp)
    print(f"reps={reps} correct={ok}")
    if not ok:
        print("out", out[:2, :8])
        print("exp", exp[:2, :8])
        return None
    # timing
    fj = jax.jit(f)
    fj(pg, col, row).block_until_ready()
    t0 = time.perf_counter()
    N = 100
    for _ in range(N):
        o = fj(pg, col, row)
    o.block_until_ready()
    dt = (time.perf_counter() - t0) / N
    per_pair = dt / reps
    print(f"  {dt*1e6:.1f} us/call, {per_pair*1e9:.1f} ns per gather-pair "
          f"({per_pair*1e9/1024*1000:.2f} ps/lane-elem)")
    return per_pair


if __name__ == "__main__":
    print(jax.devices())
    run(1)
    run(64)
    run(512)
