"""Counter-based per-pixel RNG.

Replaces the reference's single shared `UniformSampler` (mt19937 accessed from
every render thread — an actual data race, CPU_PathTracer.h:144, SURVEY §5)
with stateless threefry key derivation: every (pixel, sample, bounce, use)
tuple gets an independent stream, so renders are bit-reproducible and
parallelism-order independent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def keys_for_pixels(base_key: jax.Array, pixel_ids: jax.Array, sample_index) -> jax.Array:
    """One key per *global* pixel id for a progressive sample index.

    Keys depend only on (base_key, pixel_id, sample) — NOT on the position of
    the pixel within the local shard — so a multi-device render sharded over
    pixels is bit-identical to the single-device render.
    """
    k = jax.random.fold_in(base_key, sample_index)
    return jax.vmap(lambda i: jax.random.fold_in(k, i))(pixel_ids)


def pixel_keys(base_key: jax.Array, n_pixels: int, sample_index) -> jax.Array:
    """One key per pixel for a given progressive sample index. [n_pixels, 2]."""
    return keys_for_pixels(base_key, jnp.arange(n_pixels), sample_index)


def bounce_uniform(keys: jax.Array, bounce, n: int, tag: int = 0) -> jnp.ndarray:
    """[N, n] uniforms for this bounce; `tag` separates independent uses."""
    def draw(k):
        # bounce -1 is reserved for camera-jitter draws
        k = jax.random.fold_in(k, (bounce + 1) * 97 + tag)
        return jax.random.uniform(k, (n,), dtype=jnp.float32)

    return jax.vmap(draw)(keys)
