"""unetdc_tpu — TPU-native (JAX/XLA/Pallas/pjit) framework for dilated-conv
U-Net lipid-droplet segmentation and quantification.

A ground-up rebuild of the capabilities of malani86/unet-DC-segmentation
(reference mounted at /root/reference) designed TPU-first:

- Models are Flax/NHWC with XLA-native dilated convolutions
  (reference: models/model.py, models/model_2.py).
- The classical image-analysis stage (connected components, regionprops,
  rolling-ball background, Otsu, density/ring heatmaps) runs on device as
  XLA/Pallas kernels (reference delegates these to OpenCV/skimage on host:
  utils/data_loader.py:11-24, quantify_droplets_batch.py:81-95,
  algorithms.py).
- Batch inference and training scale with data-parallel + spatial sharding
  over a `jax.sharding.Mesh` (the reference has no parallelism at all).
"""

__version__ = "0.1.0"

from unetdc_tpu.models.unet import UNet, UNetDC  # noqa: F401
