from nphm_tpu.ops.grid import create_grid_points_from_bounds
from nphm_tpu.ops.marching import marching_tets, mesh_from_logits

__all__ = [
    "create_grid_points_from_bounds",
    "marching_tets",
    "mesh_from_logits",
]
