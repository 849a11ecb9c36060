"""Device texture atlas with bilinear fetch.

Replaces KIRK::Texture::getColor CPU byte-image sampling
(/root/reference/src/libraries/KIRK/Common/Texture.h:25-90) with a stacked
[NT, H, W, 4] float atlas and a gather-based bilinear fetch over whole
wavefronts. Textures keep their own resolutions: each image is embedded at
the atlas' top-left corner and its true (h, w) recorded in `sizes`, so the
fetch addresses every texture at native resolution (images larger than the
atlas are box-resized down).

Channel semantics follow the reference (Texture.h:25-90 carries 1-4
channels; Material.cpp:15-23 float-slot fetches take glm::length of the
full RGBA): the atlas stores RGBA (alpha defaults to 1 where the source
image has none), color fetches return RGB, float fetches the 4-channel
length.

Atlas construction is host-side numpy (scene build never dispatches eager
device ops — see scene.types._as_f32); `fetch_bilinear` is jit-traced.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class TextureAtlas(NamedTuple):
    """Stacked textures + per-texture native sizes."""

    images: np.ndarray  # [NT, H, W, 4] f32, each embedded at (0, 0)
    sizes: np.ndarray  # [NT, 2] int32 (h, w)


def _to_float_rgba(img: np.ndarray) -> np.ndarray:
    """1/2/3/4-channel byte or float image -> HxWx4 f32 (Texture.h:25-90
    channel flexibility; missing alpha = 1, greyscale broadcast to RGB)."""
    a = np.asarray(img)
    if a.dtype == np.uint8:
        a = a.astype(np.float32) / 255.0
    a = a.astype(np.float32)
    if a.ndim == 2:
        a = a[..., None]
    c = a.shape[-1]
    if c == 1:  # grey -> RGB
        a = a.repeat(3, axis=-1)
    elif c == 2:  # grey + alpha
        a = np.concatenate([a[..., :1].repeat(3, axis=-1), a[..., 1:2]],
                           axis=-1)
    if a.shape[-1] == 3:
        a = np.concatenate([a, np.ones_like(a[..., :1])], axis=-1)
    return a[..., :4]


def _resize_nearest(a: np.ndarray, h: int, w: int) -> np.ndarray:
    ys = np.linspace(0, a.shape[0] - 1, h).astype(np.int64)
    xs = np.linspace(0, a.shape[1] - 1, w).astype(np.int64)
    return a[ys][:, xs]


def build_atlas(images: list[np.ndarray], size: int | None = None) -> TextureAtlas:
    """Stack images (HxWx{1..4} float or uint8) into a TextureAtlas.

    `size` caps the atlas resolution (default: the largest image dimension,
    clamped to 2048); smaller images keep their native size.
    """
    if not images:
        return TextureAtlas(np.zeros((0, 1, 1, 4), np.float32),
                            np.zeros((0, 2), np.int32))
    floats = [_to_float_rgba(im) for im in images]
    max_dim = max(max(a.shape[0], a.shape[1]) for a in floats)
    cap = int(size) if size else min(max_dim, 2048)
    floats = [
        a if max(a.shape[0], a.shape[1]) <= cap
        else _resize_nearest(a, min(a.shape[0], cap), min(a.shape[1], cap))
        for a in floats
    ]
    h = max(a.shape[0] for a in floats)
    w = max(a.shape[1] for a in floats)
    out = np.zeros((len(floats), h, w, 4), np.float32)
    sizes = np.zeros((len(floats), 2), np.int32)
    for i, a in enumerate(floats):
        out[i, : a.shape[0], : a.shape[1]] = a
        sizes[i] = (a.shape[0], a.shape[1])
    return TextureAtlas(out, sizes)


def fetch_bilinear(atlas, tex_id: jnp.ndarray, uv: jnp.ndarray,
                   sizes=None, channels: int = 3) -> jnp.ndarray:
    """Bilinear sample: atlas [NT,H,W,C] (or TextureAtlas), tex_id [R],
    uv [R,2] -> [R,channels]. UVs wrap (repeat addressing); v is flipped to
    image row order. With `sizes` [NT,2] each texture is addressed at its
    native resolution. channels=3 returns RGB; channels=4 includes alpha
    (clamped to what the atlas actually stores — legacy RGB atlases still
    fetch)."""
    if isinstance(atlas, TextureAtlas):
        sizes = atlas.sizes if sizes is None else sizes
        atlas = atlas.images
    atlas = jnp.asarray(atlas)
    atlas = atlas[..., : min(channels, atlas.shape[-1])]
    if sizes is None:
        h = jnp.full(tex_id.shape, atlas.shape[1], jnp.float32)
        w = jnp.full(tex_id.shape, atlas.shape[2], jnp.float32)
    else:
        sizes = jnp.asarray(sizes)
        h = sizes[tex_id, 0].astype(jnp.float32)
        w = sizes[tex_id, 1].astype(jnp.float32)
    u = uv[:, 0] % 1.0
    v = 1.0 - (uv[:, 1] % 1.0)
    x = u * (w - 1)
    y = v * (h - 1)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, (w - 1).astype(jnp.int32))
    y1 = jnp.minimum(y0 + 1, (h - 1).astype(jnp.int32))
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    c00 = atlas[tex_id, y0, x0]
    c01 = atlas[tex_id, y0, x1]
    c10 = atlas[tex_id, y1, x0]
    c11 = atlas[tex_id, y1, x1]
    return (c00 * (1 - fx) + c01 * fx) * (1 - fy) + (c10 * (1 - fx) + c11 * fx) * fy
