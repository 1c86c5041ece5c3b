from unetdc_tpu.models.unet import (  # noqa: F401
    UNet,
    UNetDC,
    fold_batchnorm,
    init_params,
)
