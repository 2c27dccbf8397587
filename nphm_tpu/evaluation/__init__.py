from nphm_tpu.evaluation.metrics import eval_pointcloud, distance_p2p
from nphm_tpu.evaluation.render import (
    rasterize,
    gen_render_samples,
    fibonacci_sphere,
    look_at,
)

__all__ = [
    "eval_pointcloud",
    "distance_p2p",
    "rasterize",
    "gen_render_samples",
    "fibonacci_sphere",
    "look_at",
]
