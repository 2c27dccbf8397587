from nphm_tpu.reconstruction.extract import (
    make_point_evaluator,
    get_logits,
    get_logits_backward,
    deform_mesh,
    extract_mesh,
)

__all__ = [
    "make_point_evaluator",
    "get_logits",
    "get_logits_backward",
    "deform_mesh",
    "extract_mesh",
]
