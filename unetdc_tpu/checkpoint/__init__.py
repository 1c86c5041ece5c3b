from unetdc_tpu.checkpoint.pth import load_pth_state_dict  # noqa: F401
from unetdc_tpu.checkpoint.convert import (  # noqa: F401
    torch_state_dict_to_variables,
    variables_to_torch_state_dict,
)
from unetdc_tpu.checkpoint.native import (  # noqa: F401
    save_checkpoint,
    load_checkpoint,
    BestMetricCheckpointer,
)
