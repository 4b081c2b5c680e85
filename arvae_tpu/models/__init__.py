from arvae_tpu.models.image_vae import MnistVAE, DspritesVAE, VAEOutput
from arvae_tpu.models.image_fader import (
    MnistFaderNetwork,
    DspritesFaderNetwork,
    ImageFaderDiscriminator,
)
from arvae_tpu.models.measure_vae import (
    Encoder,
    HierarchicalDecoder,
    MeasureVAE,
    MeasureVAEOutput,
    SRDecoder,
    SRDecoderNoInput,
)

__all__ = [
    "MnistVAE",
    "DspritesVAE",
    "VAEOutput",
    "MnistFaderNetwork",
    "DspritesFaderNetwork",
    "ImageFaderDiscriminator",
    "Encoder",
    "HierarchicalDecoder",
    "MeasureVAE",
    "MeasureVAEOutput",
    "SRDecoder",
    "SRDecoderNoInput",
]
