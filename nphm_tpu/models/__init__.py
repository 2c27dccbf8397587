from nphm_tpu.models.deepsdf import DeepSDFConfig, init_deepsdf, apply_deepsdf
from nphm_tpu.models.ensemble import (
    NPHMConfig,
    init_nphm,
    apply_nphm,
    predict_anchors,
    gaussian_blend,
)
from nphm_tpu.models.deformation import (
    DeformationConfig,
    init_deformation,
    apply_deformation,
)
from nphm_tpu.models.decoders import (
    Decoder,
    make_npm_decoder,
    make_nphm_decoder,
    make_deformation_decoder,
)
from nphm_tpu.models.fields import (
    spatial_gradient,
    value_and_spatial_gradient,
    point_jacobian,
    warp_jacobian,
)

__all__ = [
    "DeepSDFConfig",
    "init_deepsdf",
    "apply_deepsdf",
    "NPHMConfig",
    "init_nphm",
    "apply_nphm",
    "predict_anchors",
    "gaussian_blend",
    "DeformationConfig",
    "init_deformation",
    "apply_deformation",
    "Decoder",
    "make_npm_decoder",
    "make_nphm_decoder",
    "make_deformation_decoder",
    "spatial_gradient",
    "value_and_spatial_gradient",
    "point_jacobian",
    "warp_jacobian",
]
