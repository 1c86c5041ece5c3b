from unetdc_tpu.losses.losses import (  # noqa: F401
    dice_loss,
    combined_loss,
    dice_coef,
    focal_loss,
    focal_dice_loss,
)
from unetdc_tpu.losses.metrics import (  # noqa: F401
    confusion_counts,
    pixel_metrics,
    calculate_metrics,
    plot_binary_confusion_matrix_with_metrics,
)
