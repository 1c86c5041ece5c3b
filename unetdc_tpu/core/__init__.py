from unetdc_tpu.core.dtypes import DTypePolicy, default_policy  # noqa: F401
from unetdc_tpu.core.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated_sharding,
)
