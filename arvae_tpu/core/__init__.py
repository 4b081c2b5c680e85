from arvae_tpu.core.config import TrainerHParams, trainer_config_string, models_root
from arvae_tpu.core.checkpoint import Checkpointer

__all__ = [
    "TrainerHParams",
    "trainer_config_string",
    "models_root",
    "Checkpointer",
]
