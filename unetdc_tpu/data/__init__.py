from unetdc_tpu.data.dataset import (  # noqa: F401
    discover_pairs,
    split_dataset,
    SegmentationData,
    Prefetcher,
)
from unetdc_tpu.data.augment import augment_batch  # noqa: F401
