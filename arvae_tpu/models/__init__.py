from arvae_tpu.models.image_vae import MnistVAE, DspritesVAE, VAEOutput
from arvae_tpu.models.image_fader import (
    MnistFaderNetwork,
    DspritesFaderNetwork,
    ImageFaderDiscriminator,
)

__all__ = [
    "MnistVAE",
    "DspritesVAE",
    "VAEOutput",
    "MnistFaderNetwork",
    "DspritesFaderNetwork",
    "ImageFaderDiscriminator",
]
