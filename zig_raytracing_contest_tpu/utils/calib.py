"""Chip-session calibration probe.

The same official binary has measured 17.5-28.8 Mrays/s across chip
sessions (docs/PERFORMANCE.md round-4 notes) — a ±25-40% envelope that is
larger than most individual optimization levers, so raw medians from
different sessions are not comparable.  This probe is a FIXED device
workload (no scene, no Pallas, one jitted fori_loop of MXU matmuls with a
VPU elementwise tail) timed at session start: its wall-clock tracks the
chip/tunnel state, so a lever's cross-session delta can be quoted as a
calibrated ratio (rate · calib_ms / CALIB_REF_MS) alongside the raw
median.  bench.py emits it in the JSON line; scripts/chip_session.sh runs
it first.

Sizing: 48 iterations × (4096² @ 4096²) ≈ 6.6 Tflop f32 → ~100-300 ms on
a v5e — far above the axon tunnel's ~25-30 ms dispatch floor, so the
timing reflects device throughput, not RPC latency.  The result is
fetched as a host scalar (block_until_ready alone is unreliable through
the tunnel; docs/PERFORMANCE.md).
"""

from __future__ import annotations

import time

CALIB_ITERS = 48
CALIB_N = 4096
# Reference probe time: the round-5 session that recalibrated the record
# tables (docs/PERFORMANCE.md; measured 2026-08-20, the session that shipped
# MID_RESORT_BOUNCES).  A session measuring calib_ms == this is "nominal";
# quote calibrated rates as rate * (calib_ms / CALIB_REF_MS).
CALIB_REF_MS = 65.5


def chip_calibration(reps: int = 3) -> float:
    """Median wall-clock (ms) of the fixed probe, compile excluded."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def probe(x):
        def body(_, y):
            y = jnp.dot(x, y, preferred_element_type=jnp.float32)
            return y * (0.9999 / jnp.max(jnp.abs(y)))  # VPU tail + norm

        return jax.lax.fori_loop(0, CALIB_ITERS, body, x).sum()

    x = jnp.eye(CALIB_N, dtype=jnp.float32) * 1.0001
    float(probe(x))  # compile + first dispatch
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(probe(x))  # host fetch = the only reliable sync
        times.append((time.perf_counter() - t0) * 1e3)
    times.sort()
    return round(times[len(times) // 2], 1)


# Reference dispatch latency: the axon tunnel's long-documented ~25-30 ms
# per-dispatch floor (docs/PERFORMANCE.md round-2 notes), confirmed by the
# first measured probe (26.65 ms, 2026-08-21, a session whose THROUGHPUT
# probe was simultaneously nominal at 1.027).  A session reading far above
# this depresses dispatch-bound workloads only — the probe pair
# disambiguates "slow chip" from "slow tunnel" (the same binary opened at
# 7.3 Mrays/s and reached 33.3 once the tunnel warmed).
DISPATCH_REF_MS = 26.7


def dispatch_latency(reps: int = 15) -> float:
    """Median wall-clock (ms) of a minimal dispatch + host fetch."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def tiny(x):
        return x + 1.0

    x = jnp.zeros((8,), jnp.float32)
    float(tiny(x)[0])  # compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(tiny(x)[0])
        times.append((time.perf_counter() - t0) * 1e3)
    times.sort()
    return round(times[len(times) // 2], 2)
