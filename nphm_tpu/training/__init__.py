from nphm_tpu.training.losses import identity_sdf_loss, deformation_loss
from nphm_tpu.training.latents import (
    LatentTable,
    init_latent_table,
    renorm_rows,
    row_adam_init,
    row_adam_update,
)
from nphm_tpu.training.checkpoints import save_checkpoint, load_checkpoint, latest_checkpoint_epoch
from nphm_tpu.training.trainer import IdentityTrainer
from nphm_tpu.training.trainer_corresp import DeformationTrainer

__all__ = [
    "identity_sdf_loss",
    "deformation_loss",
    "LatentTable",
    "init_latent_table",
    "renorm_rows",
    "row_adam_init",
    "row_adam_update",
    "save_checkpoint",
    "load_checkpoint",
    "latest_checkpoint_epoch",
    "IdentityTrainer",
    "DeformationTrainer",
]
