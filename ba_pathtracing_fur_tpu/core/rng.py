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


def pixel_keys(base_key: jax.Array, n_pixels: int, sample_index) -> jax.Array:
    """One key per pixel for a given progressive sample index. [n_pixels, 2]."""
    k = jax.random.fold_in(base_key, sample_index)
    return jax.vmap(lambda i: jax.random.fold_in(k, i))(jnp.arange(n_pixels))


def bounce_uniform(keys: jax.Array, bounce, n: int, tag: int = 0) -> jnp.ndarray:
    """[N, n] uniforms for this bounce; `tag` separates independent uses."""
    def draw(k):
        # bounce -1 is reserved for camera-jitter draws
        k = jax.random.fold_in(k, (bounce + 1) * 97 + tag)
        return jax.random.uniform(k, (n,), dtype=jnp.float32)

    return jax.vmap(draw)(keys)
