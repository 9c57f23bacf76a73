"""Counter-based per-ray RNG (threefry) for the wavefront tracer.

The reference seeds one sequential PRNG per OS thread with the thread index
(src/stage3.zig:225), so its output depends on thread count.  The TPU-native
replacement derives an independent key per *global ray id* (pixel · spp +
sample) — deterministic regardless of wave size, device count, or sharding.
Per-bounce streams fold in a small tag.  Bit-exact parity with the reference
is impossible by construction (SURVEY.md §7.5); acceptance is statistical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_fold_batch = jax.vmap(jax.random.fold_in, in_axes=(0, 0))
_fold_tag = jax.vmap(jax.random.fold_in, in_axes=(0, None))


def ray_keys(base_key, global_ray_ids):
    """One key per ray from its global ray id (R,) int32/uint32."""
    return _fold_batch(
        jnp.broadcast_to(base_key, global_ray_ids.shape), global_ray_ids
    )


def uniform(keys, tag: int):
    """(R,) uniforms in [0, 1), one per ray key, stream selected by tag."""
    tagged = _fold_tag(keys, tag)
    return jax.vmap(lambda k: jax.random.uniform(k, ()))(tagged)


def uniform2(keys, tag: int):
    """(R, 2) uniforms — pixel jitter (src/stage3.zig:238)."""
    tagged = _fold_tag(keys, tag)
    return jax.vmap(lambda k: jax.random.uniform(k, (2,)))(tagged)


def normal3(keys, tag: int):
    """(R, 3) standard normals — Gaussian sphere sampling feed
    (src/linalg.zig:140-148)."""
    tagged = _fold_tag(keys, tag)
    return jax.vmap(lambda k: jax.random.normal(k, (3,)))(tagged)
