from nphm_tpu.fitting.broyden import broyden, search
from nphm_tpu.fitting.inference import (
    FittingConfig,
    fit_identity,
    fit_joint,
    fit_joint_batch,
    fit_joint_batch_resilient,
    default_joint_lambdas,
    default_joint_schedule,
)

__all__ = [
    "broyden",
    "search",
    "FittingConfig",
    "fit_identity",
    "fit_joint",
    "fit_joint_batch",
    "fit_joint_batch_resilient",
    "default_joint_lambdas",
    "default_joint_schedule",
]
