"""On-device classical image-analysis ops (the XLA/Pallas kernel surface).

Everything the reference delegates to OpenCV/skimage/scipy C code on the host
(SURVEY.md §2.2/§2.5) is re-implemented here as jittable JAX ops so the
inference pipeline runs image->mask->droplet-table entirely on TPU.
"""

from unetdc_tpu.ops.connected_components import (  # noqa: F401
    label,
    label_batch,
    propagate_roots,
    quantify_mask,
    quantify_mask_adaptive,
    quantify_mask_batch,
    remove_small_batch,
    remove_small_batch_counted,
    sieve_small_components,
)
from unetdc_tpu.ops.regionprops import (  # noqa: F401
    regionprops_table,
    centroid_size_image,
)
from unetdc_tpu.ops.density import (  # noqa: F401
    density_map,
    density_maps,
    get_target,
    get_targets,
    gaussian_density_map,
    radial_centroid_count_map,
)
from unetdc_tpu.ops.contours import (  # noqa: F401
    contour_scan,
    contour_spreading_4,
    contour_spreading_8,
    contour_shrinking_box,
    remove_objects,
    calculate_contours_centroid,
)
from unetdc_tpu.ops.roi import (  # noqa: F401
    generate_roi_mask,
    moments_centroid,
    rgb2gray_cv2,
)
from unetdc_tpu.ops.edt import (  # noqa: F401
    distance_transform_edt,
    distance_transform_edt_sq,
    peak_local_max_device,
    watershed_device,
)
from unetdc_tpu.ops.diffmap import (  # noqa: F401
    create_difference_map,
    overlay_difference,
    count_color_regions,
)
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
