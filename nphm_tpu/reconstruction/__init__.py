from nphm_tpu.reconstruction.extract import (
    make_point_evaluator,
    get_logits,
    get_logits_backward,
    deform_mesh,
    extract_mesh,
    extract_mesh_streamed,
)
from nphm_tpu.reconstruction.sparse import extract_mesh_sparse

__all__ = [
    "make_point_evaluator",
    "get_logits",
    "get_logits_backward",
    "deform_mesh",
    "extract_mesh",
    "extract_mesh_streamed",
    "extract_mesh_sparse",
]
