"""Does Mosaic give ~2x VPU throughput for bf16 on the sweep's op mix?

Round-4-plan candidate 3 (bf16 cull-sweep + exact f32 refine) is only
viable if the (16, 128)-vreg bf16 path actually doubles elementwise
throughput for the Moller-Trumbore mix (broadcasted FMA + divide +
compares + select + min-fold).  This kernel runs the exact sweep op
sequence over a resident bank for ITERS iterations and prices one sweep
by the SLOPE between two iteration counts — the ~25-30 ms dispatch floor
of the tunneled chip and the kernel entry cost cancel in the difference.

Run on the TPU chip:  python scripts/micro_bf16.py
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

K = 128      # triangles per tile (sublanes)
NT = 64      # distinct tiles in the bank
LB = 512     # lanes (rays)


def _sweep_kernel(bank_ref, state_ref, out_ref, *, iters, dtype):
    ox = state_ref[0, :]
    oy = state_ref[1, :]
    oz = state_ref[2, :]
    dx = state_ref[3, :]
    dy = state_ref[4, :]
    dz = state_ref[5, :]

    def body(i, best):
        jt = jax.lax.rem(i, NT)
        s = pl.multiple_of(jt * K, K)
        # The (K,) lane-vector -> (K, 1) sublane-column reshape only lowers
        # in f32 (Mosaic: "tpu.reshape vector<128xbf16>" unsupported), so
        # the bank stays f32 and the broadcast COLUMNS cast to the compute
        # dtype.  bf16 COMPARES don't lower either ("arith.cmpf
        # vector<8x128x2xbf16>"), so the t/u/v/cull tail casts up to f32 —
        # this kernel prices the realistically-achievable mix: bf16 for
        # the 30-op transform FMA bulk, f32 for div + compares + fold.
        rows = bank_ref[:, pl.ds(s, K)]
        m = lambda r: rows[r][:, None].astype(dtype)
        ou = (m(0) * ox + m(1) * oy + m(2) * oz + m(9)).astype(jnp.float32)
        ov = (m(3) * ox + m(4) * oy + m(5) * oz + m(10)).astype(jnp.float32)
        ow = (m(6) * ox + m(7) * oy + m(8) * oz + m(11)).astype(jnp.float32)
        du = (m(0) * dx + m(1) * dy + m(2) * dz).astype(jnp.float32)
        dv = (m(3) * dx + m(4) * dy + m(5) * dz).astype(jnp.float32)
        dw = (m(6) * dx + m(7) * dy + m(8) * dz).astype(jnp.float32)
        t = -ow / dw
        u = ou + t * du
        v = ov + t * dv
        det = -dw * rows[12][:, None]
        ok = (
            (det >= 1e-8)
            & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 0)
        )
        t = jnp.where(ok, t, jnp.inf)
        return jnp.minimum(best, jnp.min(t, axis=0))

    best = jax.lax.fori_loop(
        0, iters, body, jnp.full((LB,), jnp.inf, jnp.float32)
    )
    out_ref[0, :] = best


def build(iters, dtype):
    kernel = partial(_sweep_kernel, iters=iters, dtype=dtype)
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec((13, NT * K), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((6, LB), lambda: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, LB), lambda: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, LB), jnp.float32),
    )


def best_time(fn, n=8):
    # block_until_ready is unreliable through the axon tunnel (returns
    # before execution); a host fetch is the only trustworthy sync.  The
    # fetch cost is iteration-count-independent, so the slope cancels it.
    np.asarray(fn())
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    g = np.random.default_rng(0)
    bank32 = g.uniform(-2, 2, (13, NT * K)).astype(np.float32)
    st32 = np.zeros((6, LB), np.float32)
    st32[0:3] = g.uniform(-8, 8, (3, LB))
    d = g.standard_normal((3, LB))
    st32[3:6] = d / np.linalg.norm(d, axis=0, keepdims=True)

    lo, hi = 16384, 65536
    for dtype in (jnp.float32, jnp.bfloat16):
        bank = jnp.asarray(bank32)  # bank stays f32 (see kernel note)
        st = jnp.asarray(st32, dtype)
        times = {}
        for iters in (lo, hi):
            f = build(iters, dtype)
            times[iters] = best_time(lambda f=f: f(bank, st))
        per_sweep = (times[hi] - times[lo]) / (hi - lo)
        print(
            f"{jnp.dtype(dtype).name:9s}: t({lo})={times[lo]*1e3:7.2f} ms  "
            f"t({hi})={times[hi]*1e3:7.2f} ms  "
            f"-> {per_sweep*1e6:6.3f} us per (128x{LB}) sweep",
            flush=True,
        )


if __name__ == "__main__":
    main()
