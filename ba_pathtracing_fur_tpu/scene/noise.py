"""Procedural noise textures — the Noise helper analog.

The reference renders a noise texture into an FBO for preview-side effects
(/root/reference/src/libraries/KIRK/Utils/Noise.h:9-36). Here the same
capability is a pure-jnp texture generator: hash-based value noise with
fractal (fBm) octaves, producing [H,W,3] arrays that drop straight into the
texture atlas (scene.texture.build_atlas) or an Environment sphere map.
"""

from __future__ import annotations

import jax.numpy as jnp


def _counter_hash(x):
    """Wang-hash style integer mix (inc_random.compute:22-29 family) →
    [0,1) float. Stateless per-lattice-point, so the texture is identical
    at any resolution/tile."""
    x = x.astype(jnp.uint32)
    x = (x ^ jnp.uint32(61)) ^ (x >> 16)
    x = x * jnp.uint32(9)
    x = x ^ (x >> 4)
    x = x * jnp.uint32(0x27D4EB2D)
    x = x ^ (x >> 15)
    return x.astype(jnp.float32) / jnp.float32(2**32)


def value_noise(shape, scale: float = 8.0, seed: int = 0) -> jnp.ndarray:
    """[H,W] single-octave value noise: bilinear interpolation of hashed
    lattice values at `scale` cells across the image."""
    h, w = shape
    ys, xs = jnp.meshgrid(jnp.linspace(0.0, scale, h, endpoint=False),
                          jnp.linspace(0.0, scale, w, endpoint=False),
                          indexing="ij")
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    fx = xs - x0
    fy = ys - y0
    # smoothstep fade
    fx = fx * fx * (3.0 - 2.0 * fx)
    fy = fy * fy * (3.0 - 2.0 * fy)

    def lattice(dx, dy):
        ix = (x0 + dx).astype(jnp.uint32) + jnp.uint32(seed) * jnp.uint32(0x9E3779B9)
        iy = (y0 + dy).astype(jnp.uint32)
        return _counter_hash((ix << 16) ^ iy ^ (ix >> 7))

    v00, v10 = lattice(0, 0), lattice(1, 0)
    v01, v11 = lattice(0, 1), lattice(1, 1)
    top = v00 + fx * (v10 - v00)
    bot = v01 + fx * (v11 - v01)
    return top + fy * (bot - top)


def fbm_noise(shape, octaves: int = 4, scale: float = 4.0,
              gain: float = 0.5, lacunarity: float = 2.0,
              seed: int = 0) -> jnp.ndarray:
    """[H,W] fractal Brownian motion: summed value-noise octaves."""
    acc = jnp.zeros(shape, jnp.float32)
    amp, total = 1.0, 0.0
    for o in range(octaves):
        acc = acc + amp * value_noise(shape, scale * lacunarity**o, seed + o)
        total += amp
        amp *= gain
    return acc / total


def noise_texture(size: int = 256, octaves: int = 4, scale: float = 4.0,
                  color_lo=(0.0, 0.0, 0.0), color_hi=(1.0, 1.0, 1.0),
                  seed: int = 0) -> jnp.ndarray:
    """[size,size,3] fBm noise texture lerped between two colors — the
    drop-in replacement for the reference's FBO noise texture."""
    n = fbm_noise((size, size), octaves=octaves, scale=scale, seed=seed)
    lo = jnp.asarray(color_lo, jnp.float32)
    hi = jnp.asarray(color_hi, jnp.float32)
    return lo + n[..., None] * (hi - lo)
