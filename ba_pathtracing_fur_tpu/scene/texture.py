"""Device texture atlas with bilinear fetch.

Replaces KIRK::Texture::getColor CPU byte-image sampling
(/root/reference/src/libraries/KIRK/Common/Texture.h:25-90) with a stacked
[NT, H, W, 3] float atlas (all textures resized to a common resolution at
scene build) and a gather-based bilinear fetch over whole wavefronts.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def build_atlas(images: list[np.ndarray], size: int = 256) -> jnp.ndarray:
    """Stack images (HxWx3 float or uint8) into [NT, size, size, 3]."""
    out = np.zeros((len(images), size, size, 3), np.float32)
    for i, img in enumerate(images):
        a = np.asarray(img)
        if a.dtype == np.uint8:
            a = a.astype(np.float32) / 255.0
        if a.ndim == 2:
            a = a[..., None].repeat(3, axis=-1)
        a = a[..., :3]
        # nearest resize to atlas resolution
        ys = (np.linspace(0, a.shape[0] - 1, size)).astype(np.int64)
        xs = (np.linspace(0, a.shape[1] - 1, size)).astype(np.int64)
        out[i] = a[ys][:, xs]
    return jnp.asarray(out)


def fetch_bilinear(atlas: jnp.ndarray, tex_id: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample: atlas [NT,H,W,3], tex_id [R], uv [R,2] -> [R,3].
    UVs wrap (repeat addressing); v is flipped to image row order."""
    h, w = atlas.shape[1], atlas.shape[2]
    u = uv[:, 0] % 1.0
    v = 1.0 - (uv[:, 1] % 1.0)
    x = u * (w - 1)
    y = v * (h - 1)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    c00 = atlas[tex_id, y0, x0]
    c01 = atlas[tex_id, y0, x1]
    c10 = atlas[tex_id, y1, x0]
    c11 = atlas[tex_id, y1, x1]
    return (c00 * (1 - fx) + c01 * fx) * (1 - fy) + (c10 * (1 - fx) + c11 * fx) * fy
