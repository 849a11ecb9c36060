"""Multi-device / multi-host parallelism (SURVEY §2.4, §7 step 7)."""

from .mesh import DP_AXIS, GEO_AXIS, make_mesh, multihost_initialize
from .render import (
    pad_scene_geo,
    render_image_sharded,
    render_image_sharded_jit,
    scene_partition_specs,
)
from .scaling import measure_scaling, scaling_panel
from .train import TrainState, loss_fn, material_params, train_step

__all__ = [
    "DP_AXIS", "GEO_AXIS", "make_mesh", "multihost_initialize",
    "pad_scene_geo", "render_image_sharded", "render_image_sharded_jit",
    "scene_partition_specs", "TrainState", "loss_fn", "material_params",
    "train_step", "measure_scaling", "scaling_panel",
]
