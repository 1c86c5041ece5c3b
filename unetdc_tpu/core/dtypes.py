"""Dtype policy for TPU execution.

TPU MXU peak throughput is in bfloat16 with float32 accumulation; parameters
and BatchNorm statistics stay float32. The reference framework is fp32-only
PyTorch (it creates a GradScaler but never uses it — train.py:127), so fp32
compute is the parity mode and bf16 the fast mode.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    """Computation/parameter dtype pairing.

    param_dtype:   dtype parameters are stored in (always f32 here).
    compute_dtype: dtype activations/matmuls run in (bf16 on TPU for speed,
                   f32 for bit-level parity testing).
    """

    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.float32

    def cast_input(self, x):
        return x.astype(self.compute_dtype)


def default_policy(fast: bool = True) -> DTypePolicy:
    """bf16 compute on TPU by default; f32 when `fast=False` (parity mode)."""
    return DTypePolicy(compute_dtype=jnp.bfloat16 if fast else jnp.float32)
