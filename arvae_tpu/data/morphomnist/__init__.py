from arvae_tpu.data.morphomnist.measure import measure_image, measure_batch
from arvae_tpu.data.morphomnist.morpho import ImageMorphology, ImageMoments

__all__ = ["measure_image", "measure_batch", "ImageMorphology", "ImageMoments"]
