from arvae_tpu.data.loaders import ArrayDataset, EpochLoader, SplitArrayDataset
from arvae_tpu.data.mnist import MnistDataset, MorphoMnistDataset
from arvae_tpu.data.dsprites import DspritesDataset

__all__ = [
    "ArrayDataset",
    "EpochLoader",
    "SplitArrayDataset",
    "MnistDataset",
    "MorphoMnistDataset",
    "DspritesDataset",
]
