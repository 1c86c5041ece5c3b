"""On-device classical image-analysis ops (the XLA/Pallas kernel surface).

Everything the reference delegates to OpenCV/skimage/scipy C code on the host
(SURVEY.md §2.2/§2.5) is re-implemented here as jittable JAX ops so the
inference pipeline runs image->mask->droplet-table entirely on TPU.
"""

from unetdc_tpu.ops.connected_components import label, sieve_small_components  # noqa: F401
from unetdc_tpu.ops.regionprops import regionprops_table  # noqa: F401
from unetdc_tpu.ops.resize import (  # noqa: F401
    resize_linear,
    resize_nearest,
    resize_area,
    resize_mask_linear_round,
)
from unetdc_tpu.ops.morphology import (  # noqa: F401
    ellipse_kernel,
    erode,
    dilate,
    morph_open,
    morph_close,
)
from unetdc_tpu.ops.rolling_ball import rolling_ball_correction_rgb  # noqa: F401
from unetdc_tpu.ops.threshold import otsu_threshold  # noqa: F401
from unetdc_tpu.ops.filters import gaussian_blur, gaussian_filter_scipy  # noqa: F401
