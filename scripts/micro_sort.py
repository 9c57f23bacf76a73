"""Price lane-permutation strategies for the between-bounce ray resort.

The wave profile (docs/ROUND4.md, xprof 2026-08-19) charges ~21 ms/wave of a
~50 ms official wave to permutation machinery around a 0.5 ms key sort:
the (16, R) axis-1 gather by perm (fusion.18, 12 ms), the inverse-perm
fusions (7 ms), and the (4, R) unsort gather (2.3 ms).  XLA gathers along
the lane axis of a field-major array run at ~5 GB/s effective on v5e — the
TPU has no gather unit.

Candidate replacement: variadic ``lax.sort`` carrying the state rows as
PAYLOAD operands — payload movement happens inside the sort network
(sequential compare-exchange passes, no random access).  This script
measures, on the real chip, the per-op cost of:

  A. argsort + take((16,R), perm, axis=1) + invert_perm + take((4,R))
     [the shipped composition]
  B. lax.sort((key, iota, 16 payload rows)) + lax.sort((iota, 4 rows))
     [payload sort + payload unsort]
  C. the B sorts with is_stable=True (matches jnp.argsort bit-for-bit)

Method: K-chained ops inside one jit (data-dependent chaining defeats DCE;
bitonic sort cost is data-independent, so re-sorting sorted data times the
same work), slope between K_LO and K_HI cancels the ~25-30 ms tunnel
dispatch floor and the fetch.  Mirrors scripts/micro_bf16.py's protocol.
"""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

R = 1 << 19
K_LO, K_HI = 2, 12
STATE_ROWS = 16
OUT_ROWS = 4  # radiance x3 + segments unsort


def _invert_perm(perm):
    R = perm.shape[0]
    return jnp.zeros((R,), jnp.int32).at[perm].set(
        jnp.arange(R, dtype=jnp.int32)
    )


@partial(jax.jit, static_argnames=("k",))
def chain_gather(state, key, k: int):
    def body(i, carry):
        state, key = carry
        perm = jnp.argsort(key)
        state = jnp.take(state, perm, axis=1)
        inv = _invert_perm(perm)
        rows4 = jnp.take(state[0:OUT_ROWS], inv, axis=1)
        # fold results back so every iteration depends on the last
        key = key + rows4[0].astype(jnp.int32) + i
        return state, key

    state, key = jax.lax.fori_loop(0, k, body, (state, key))
    return state[0, 0] + key[0]


@partial(jax.jit, static_argnames=("k", "stable"))
def chain_payload(state, key, k: int, stable: bool):
    iota = jax.lax.iota(jnp.int32, R)

    def body(i, carry):
        state, key = carry
        ops = jax.lax.sort(
            (key, iota) + tuple(state[r] for r in range(STATE_ROWS)),
            dimension=0, num_keys=1, is_stable=stable,
        )
        sorted_iota = ops[1]
        state = jnp.stack(ops[2:])
        back = jax.lax.sort(
            (sorted_iota,) + tuple(state[r] for r in range(OUT_ROWS)),
            dimension=0, num_keys=1, is_stable=stable,
        )
        key = key + back[1].astype(jnp.int32) + i
        return state, key

    state, key = jax.lax.fori_loop(0, k, body, (state, key))
    return state[0, 0] + key[0]


@partial(jax.jit, static_argnames=("k",))
def chain_sort_only(state, key, k: int):
    """Key+iota sort alone (the already-shipped part) for scale."""
    iota = jax.lax.iota(jnp.int32, R)

    def body(i, carry):
        state, key = carry
        skey, siota = jax.lax.sort(
            (key, iota), dimension=0, num_keys=1, is_stable=False
        )
        key = skey + siota + i
        return state, key

    state, key = jax.lax.fori_loop(0, k, body, (state, key))
    return state[0, 0] + key[0]


def run(fn, state, key, label):
    outs = {}
    for k in (K_LO, K_HI):
        fn(state, key, k=k).block_until_ready()  # compile
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(state, key, k=k))  # host fetch = real sync
            reps.append(time.perf_counter() - t0)
        outs[k] = min(reps)
    per_op = (outs[K_HI] - outs[K_LO]) / (K_HI - K_LO) * 1e3
    print(f"{label:32s} {per_op:8.3f} ms/op   "
          f"(K={K_LO}: {outs[K_LO]*1e3:.1f} ms, K={K_HI}: {outs[K_HI]*1e3:.1f} ms)")
    return per_op


def main():
    print(f"backend={jax.default_backend()} R={R}")
    rng = np.random.default_rng(0)
    state = jnp.asarray(rng.standard_normal((STATE_ROWS, R)), jnp.float32)
    key = jnp.asarray(rng.integers(0, 1 << 30, R), jnp.int32)

    run(chain_sort_only, state, key, "key+iota sort (shipped part)")
    a = run(chain_gather, state, key, "A: argsort+takes (shipped)")
    b = run(partial(chain_payload, stable=False), state, key,
            "B: payload sorts (unstable)")
    c = run(partial(chain_payload, stable=True), state, key,
            "C: payload sorts (stable)")
    print(f"speedup B vs A: {a / b:.2f}x   C vs A: {a / c:.2f}x")


if __name__ == "__main__":
    main()
