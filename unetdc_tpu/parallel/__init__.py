"""Parallelism utilities: data-parallel + spatial sharding over a TPU mesh.

The reference framework has no distributed code of any kind (SURVEY.md
§2.7); the TPU-native scaling story lives in `unetdc_tpu.core.mesh` and is
re-exported here: a ('data', 'space') `jax.sharding.Mesh`, batch sharding
for train/inference steps, and XLA-inserted collectives over ICI (gradient
psum under jit sharding propagation; convolution halo exchange for the
'space' axis is handled by the SPMD partitioner).
"""

from unetdc_tpu.core.mesh import (  # noqa: F401
    DATA_AXIS,
    SPACE_AXIS,
    batch_sharding,
    make_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
)
