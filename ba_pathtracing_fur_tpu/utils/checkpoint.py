"""Checkpoint / resume for progressive renders and fitted parameters.

The reference has no persistent checkpointing; its resumable state is the
in-memory progressive accumulator + sample counter (running mean,
CPU_PathTracer.cpp:68-79, c_sample + reset :245-249) with PNG snapshots
(Demo/main.cpp:129-141). Here that state is an explicit pytree —
(accum image, sample count, base RNG key, optional material params) —
saved atomically to a single .npz; multi-host runs restart from it
(SURVEY §5 failure-recovery note).
"""

from __future__ import annotations

import os
import tempfile
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class RenderState(NamedTuple):
    accum: jnp.ndarray  # [H,W,3] running mean
    sample_count: jnp.ndarray  # [] int32
    key_data: jnp.ndarray  # raw PRNG key data (uint32[...])
    params: Optional[dict] = None  # differentiable params, if fitting


def fresh_state(resolution, key) -> RenderState:
    w, h = resolution
    return RenderState(
        accum=jnp.zeros((h, w, 3), jnp.float32),
        sample_count=jnp.int32(0),
        key_data=jax.random.key_data(key),
    )


def state_key(state: RenderState):
    return jax.random.wrap_key_data(state.key_data)


def save_checkpoint(path: str, state: RenderState) -> None:
    """Atomic single-file save (write temp + rename)."""
    flat = {
        "accum": np.asarray(state.accum),
        "sample_count": np.asarray(state.sample_count),
        "key_data": np.asarray(state.key_data),
    }
    if state.params:
        for k, v in state.params.items():
            flat[f"param.{k}"] = np.asarray(v)
    d = os.path.dirname(os.path.abspath(path))
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as fh:
            np.savez(fh, **flat)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_checkpoint(path: str) -> RenderState:
    with np.load(path) as z:
        params = {k[len("param."):]: jnp.asarray(z[k])
                  for k in z.files if k.startswith("param.")}
        return RenderState(
            accum=jnp.asarray(z["accum"]),
            sample_count=jnp.asarray(z["sample_count"]),
            key_data=jnp.asarray(z["key_data"]),
            params=params or None,
        )


def render_resumable(scene, camera, cfg, state: RenderState,
                     checkpoint_path: Optional[str] = None,
                     checkpoint_every: int = 16):
    """Progressive render that continues from `state` and periodically
    checkpoints; yields (RenderState) after each sample."""
    from functools import partial

    from ..models.pathtracer import render_sample

    sample_jit = jax.jit(partial(render_sample, cfg=cfg))
    w, h = camera.resolution
    key = state_key(state)
    acc = state.accum.reshape(-1, 3)
    i = int(state.sample_count)
    while i < cfg.spp:
        c = sample_jit(scene, camera, key, i)
        acc = acc + (c - acc) / (i + 1.0)
        i += 1
        state = RenderState(accum=acc.reshape(h, w, 3),
                            sample_count=jnp.int32(i),
                            key_data=state.key_data, params=state.params)
        if checkpoint_path and i % checkpoint_every == 0:
            save_checkpoint(checkpoint_path, state)
        yield state
