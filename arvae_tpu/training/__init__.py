from arvae_tpu.training.base import TrainState, BaseTrainer
from arvae_tpu.training.image_trainer import (
    ImageVAETrainer,
    MNIST_REG_TYPES,
    MNIST_NORMALIZATION_FACTORS,
    DSPRITES_REG_TYPE,
    DATASET_REG_TYPE_DICT,
    get_reg_dim,
)

__all__ = [
    "TrainState",
    "BaseTrainer",
    "ImageVAETrainer",
    "MNIST_REG_TYPES",
    "MNIST_NORMALIZATION_FACTORS",
    "DSPRITES_REG_TYPE",
    "DATASET_REG_TYPE_DICT",
    "get_reg_dim",
]
