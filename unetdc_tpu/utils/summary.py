"""torchsummary-style model summary.

The reference optionally imports torchsummary and leaves the actual
`summary(model, input_size=(3, 512, 512))` call commented out
(train_DC_focal.py:26-31, :212). We implement the evident intent as an
opt-in `--summary` flag on the trainer CLIs: a per-module table of output
shape and parameter count, computed shape-only via jax.eval_shape (no
device work, no compile)."""

from __future__ import annotations

import jax
import numpy as np


def _count(tree) -> int:
    return sum(int(np.prod(a.shape)) for a in jax.tree_util.tree_leaves(tree))


def model_summary(model, variables, input_shape=(1, 512, 512, 3)) -> str:
    """Formatted summary table for a UNet/UNetDC flax module."""
    x = jax.ShapeDtypeStruct(tuple(input_shape), np.float32)
    shapes = jax.eval_shape(
        lambda v, xx: model.apply(v, xx, train=False,
                                  capture_intermediates=True,
                                  mutable=["intermediates"]),
        variables, x)
    inter = shapes[1]["intermediates"]
    params = variables["params"]

    lines = ["-" * 64,
             f"{'Layer (type)':<24}{'Output Shape':<24}{'Param #':>14}",
             "=" * 64]
    total = 0
    for name in params:
        n = _count(params[name])
        total += n
        out_shape = "-"
        if name in inter and "__call__" in inter[name]:
            v = inter[name]["__call__"][0]
            out_shape = str(tuple(v.shape))
        lines.append(f"{name:<24}{out_shape:<24}{n:>14,}")
    out = shapes[0]
    lines += ["=" * 64,
              f"Output shape: {tuple(out.shape)}",
              f"Total params: {total:,}",
              f"Param size (MB): {total * 4 / 1024 / 1024:.2f} (f32)",
              "-" * 64]
    return "\n".join(lines)
