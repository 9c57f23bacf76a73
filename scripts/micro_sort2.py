"""Price the STRUCTURAL permutation cuts for the between-bounce resort.

micro_sort.py prices drop-in replacements for the shipped composition
(argsort + (16,R) take + invert-perm + (4,R) take = 16.4 ms/op on chip).
This script prices the redesigns that exploit the pipeline's actual data
flow (docs/ROUND4.md):

  - radiance rows 9-11 and segment row 14 are ADDITIVE through the path
    kernel (fused.py:331-371): pass zeros in, get deltas out — they need
    no input gather, and the output only needs per-SLOT sums, never
    wave order.  Input shrinks 16 -> 11 rows (o,d,throughput,alive,
    streams), output unsort disappears into a scatter-add by perm//spp.
  - the inverse permutation is never needed at all: scatter BY perm
    replaces gather BY inv.

Variants measured (all bracketed by the same chained-op slope protocol
as micro_bf16/micro_sort so the ~25-30 ms tunnel dispatch floor cancels):

  IN-16t  take((16,R), perm)                  [shipped input half]
  IN-11t  take((11,R), perm)                  [additive-rows cut]
  IN-16x  transpose -> take((R,16) rows) -> transpose back
  IN-11x  same at 11 rows
  OUT-inv invert_perm + take((4,R), inv)      [shipped output half]
  OUT-sc  zeros(3,R).at[:, perm].set(rows3)   [scatter, no inv]
  OUT-acc zeros(3,W).at[:, perm//spp].add(rows3)  [slot scatter-add]
  OUT-seg sort-free segment-sum check: sum(rows) only (floor reference)
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
SPP = 3
W = R // SPP + 1
K_LO, K_HI = 2, 12


def _perm_of(key):
    return jnp.argsort(key)


def _chain(body):
    @partial(jax.jit, static_argnames=("k",))
    def fn(state, key, k: int):
        def step(i, carry):
            state, key = carry
            perm = _perm_of(key)
            out = body(state, perm)
            # fold a data-dependent scalar back into the key so every
            # iteration depends on the previous one (defeats DCE/CSE)
            key = key + out.astype(jnp.int32) + i
            return state, key

        state, key = jax.lax.fori_loop(0, k, step, (state, key))
        return key[0]

    return fn


def in_take(rows):
    def body(state, perm):
        g = jnp.take(state[:rows], perm, axis=1)
        return g[0]

    return body


def in_transpose(rows):
    def body(state, perm):
        g = jnp.take(state[:rows].T, perm, axis=0).T
        return g[0]

    return body


def out_inv(state, perm):
    r = perm.shape[0]
    inv = jnp.zeros((r,), perm.dtype).at[perm].set(
        jnp.arange(r, dtype=perm.dtype)
    )
    g = jnp.take(state[0:4], inv, axis=1)
    return g[0]


def out_scatter(state, perm):
    out = jnp.zeros((3, R), jnp.float32).at[:, perm].set(state[0:3])
    return out[0]


def out_acc(state, perm):
    slot = perm // SPP
    out = jnp.zeros((3, W), jnp.float32).at[:, slot].add(state[0:3])
    return jnp.sum(out[0])  # scalar fold keeps the scatter live


@partial(jax.jit, static_argnames=("k",))
def chain_payload2(state, key, k: int):
    """The production candidate: ONE variadic sort, (key, iota) as a
    num_keys=2 composite (unique -> deterministic, == stable argsort
    order), 16 payload rows; unsort the 4 result rows by a second
    num_keys=1 sort on the unique sorted-iota."""
    iota = jax.lax.iota(jnp.int32, R)

    def step(i, carry):
        state, key = carry
        ops = jax.lax.sort(
            (key, iota) + tuple(state[r] for r in range(16)),
            dimension=0, num_keys=2, is_stable=False,
        )
        perm = ops[1]
        state = jnp.stack(ops[2:])
        back = jax.lax.sort(
            (perm,) + tuple(state[r] for r in range(4)),
            dimension=0, num_keys=1, is_stable=False,
        )
        key = key + back[1].astype(jnp.int32) + i
        return state, key

    state, key = jax.lax.fori_loop(0, k, step, (state, key))
    return key[0]


def run(fn, state, key, label):
    outs = {}
    for k in (K_LO, K_HI):
        fn(state, key, k=k).block_until_ready()
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(state, key, k=k))
            reps.append(time.perf_counter() - t0)
        outs[k] = min(reps)
    per_op = (outs[K_HI] - outs[K_LO]) / (K_HI - K_LO) * 1e3
    print(f"{label:20s} {per_op:8.3f} ms/op   "
          f"(K={K_LO}: {outs[K_LO]*1e3:.1f} ms, K={K_HI}: {outs[K_HI]*1e3:.1f} ms)",
          flush=True)
    return per_op


def main():
    print(f"backend={jax.default_backend()} R={R} spp={SPP}", flush=True)
    rng = np.random.default_rng(0)
    state = jnp.asarray(rng.standard_normal((16, R)), jnp.float32)
    key = jnp.asarray(rng.integers(0, 1 << 30, R), jnp.int32)

    run(chain_payload2, state, key, "PROD: 2key+16pay+unsort")
    run(_chain(in_take(16)), state, key, "IN-16t (shipped)")
    run(_chain(in_take(11)), state, key, "IN-11t")
    run(_chain(in_transpose(16)), state, key, "IN-16x")
    run(_chain(in_transpose(11)), state, key, "IN-11x")
    run(_chain(out_inv), state, key, "OUT-inv (shipped)")
    run(_chain(out_scatter), state, key, "OUT-scatter")
    run(_chain(out_acc), state, key, "OUT-slot-add")


if __name__ == "__main__":
    main()
