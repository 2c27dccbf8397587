from nphm_tpu.data.manager import DataManager
from nphm_tpu.data.datasets import IdentityDataset, DeformationDataset
from nphm_tpu.data.synthetic import SyntheticIdentityDataset, SyntheticDeformationDataset

__all__ = [
    "DataManager",
    "IdentityDataset",
    "DeformationDataset",
    "SyntheticIdentityDataset",
    "SyntheticDeformationDataset",
]
