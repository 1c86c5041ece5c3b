"""U-Net and U-Net-DC (dilated-convolution) segmentation models, TPU-native.

Capability parity with the reference PyTorch models
(/root/reference/models/model.py:7-50 `UNet`,
 /root/reference/models/model_2.py:5-80 `UNetDC`) with a TPU-first design:

- NHWC layout (TPU convolutions tile onto the MXU in NHWC).
- Dilated 3x3 convolutions map directly to XLA `rhs_dilation`
  (`kernel_dilation` in Flax) — no im2col or emulation. padding == dilation
  in the reference is exactly 'SAME' for an effective (2d+1) kernel.
- The 2x2/stride-2 transposed convolutions of the decoder are implemented as
  a single matmul + pixel-shuffle (`UpConv2x2`) instead of
  `lax.conv_transpose`: out[b, 2h+p, 2w+q, o] = sum_i x[b,h,w,i] W[i,o,p,q].
  This is algebraically identical to `nn.ConvTranspose2d(k=2, s=2)` and runs
  as one large MXU matmul.
- BatchNorm statistics match PyTorch (eps=1e-5, momentum=0.1 torch-style =
  0.9 flax-style); `fold_batchnorm` folds BN into the conv weights for the
  inference path so each double-conv block becomes conv+bias+relu that XLA
  fuses into two kernels.
- The sigmoid is part of `__call__`, matching the reference's
  sigmoid-in-forward semantics (models/model_2.py:80) — downstream
  thresholds (0.3 / 0.5) therefore apply to probabilities.

Parameter pytree layout intentionally mirrors the reference state-dict
module names (enc1..enc4, bottleneck, upconv4..upconv1, dec4..dec1,
out_conv) so checkpoint conversion is mechanical.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class DoubleConv(nn.Module):
    """(Conv3x3 -> BN -> ReLU) x 2 with shared dilation.

    Reference: models/model_2.py:34-54 (`double_conv`, padding=dilation).
    When ``use_bn`` is False the block expects BN-folded conv parameters
    (see `fold_batchnorm`) and skips normalization entirely.
    """

    features: int
    dilation: int = 1
    use_bn: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, sample_mask=None):
        """``sample_mask`` (B,) bool excludes samples (e.g. DP ragged-tail
        padding replicas) from the batch statistics in train mode, so padded
        batches normalize and update running stats exactly as the unpadded
        batch would."""
        for i in range(2):
            x = nn.Conv(
                self.features,
                (3, 3),
                padding=self.dilation,
                kernel_dilation=self.dilation,
                dtype=self.dtype,
                name=f"conv{i}",
            )(x)
            if self.use_bn:
                # BatchNorm statistics always in f32: flax's fast-variance
                # (E[x^2] - E[x]^2) goes negative in bf16 and NaNs training
                # via rsqrt. Convs stay in compute dtype; the norm is cheap.
                mask = None
                if sample_mask is not None and train:
                    mask = sample_mask.reshape(
                        (-1,) + (1,) * (x.ndim - 1))
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    dtype=jnp.float32,
                    use_fast_variance=False,
                    name=f"bn{i}",
                )(x.astype(jnp.float32), mask=mask)
                x = x.astype(self.dtype)
            x = nn.relu(x)
        return x


class UpConv2x2(nn.Module):
    """Stride-2 2x2 transposed convolution as matmul + pixel shuffle.

    Kernel is stored in the PyTorch ConvTranspose2d layout (I, O, 2, 2)
    (reference: models/model_2.py:20-29) so checkpoints convert without
    reshuffling. Because kernel size == stride there is no overlap, and the
    op reduces to a per-pixel linear map onto 2x2 output blocks — one MXU
    matmul of shape (B*H*W, I) @ (I, 4*O).
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_feat = x.shape[-1]
        kernel = self.param(
            "kernel",
            # match torch ConvTranspose2d default init: kaiming_uniform-ish
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform"),
            (in_feat, self.features, 2, 2),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        b, h, w, _ = x.shape
        y = jnp.einsum(
            "bhwi,iopq->bhpwqo",
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            preferred_element_type=self.dtype,
        )
        y = y.reshape(b, 2 * h, 2 * w, self.features)
        return y + bias.astype(self.dtype)


def _max_pool_2x2(x):
    """2x2/stride-2 max pool (reference: F.max_pool2d(x, 2))."""
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class _UNetBase(nn.Module):
    """Shared encoder/decoder skeleton for UNet and UNetDC."""

    in_channels: int = 3
    out_channels: int = 1
    use_bn: bool = True
    dtype: Dtype = jnp.float32
    # encoder/bottleneck dilations; UNet = all ones, UNetDC = 1/2/4/8/16
    dilations: Tuple[int, int, int, int, int] = (1, 1, 1, 1, 1)
    apply_sigmoid: bool = True
    # rematerialize double-conv activations in the backward pass: trades
    # ~30% extra FLOPs for ~half the activation HBM — enables larger
    # batch/resolution training (jax.checkpoint, SURVEY §0 memory axis)
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, sample_mask=None):
        d = self.dilations
        kw = dict(use_bn=self.use_bn, dtype=self.dtype)
        DC = nn.remat(DoubleConv, static_argnums=(2,)) if self.remat \
            else DoubleConv
        sm = sample_mask
        enc1 = DC(64, d[0], name="enc1", **kw)(x, train, sm)
        enc2 = DC(128, d[1], name="enc2", **kw)(_max_pool_2x2(enc1), train, sm)
        enc3 = DC(256, d[2], name="enc3", **kw)(_max_pool_2x2(enc2), train, sm)
        enc4 = DC(512, d[3], name="enc4", **kw)(_max_pool_2x2(enc3), train, sm)

        bott = DC(1024, d[4], name="bottleneck", **kw)(
            _max_pool_2x2(enc4), train, sm
        )

        up4 = UpConv2x2(512, dtype=self.dtype, name="upconv4")(bott)
        dec4 = DC(512, 1, name="dec4", **kw)(
            jnp.concatenate([up4, enc4], axis=-1), train, sm
        )
        up3 = UpConv2x2(256, dtype=self.dtype, name="upconv3")(dec4)
        dec3 = DC(256, 1, name="dec3", **kw)(
            jnp.concatenate([up3, enc3], axis=-1), train, sm
        )
        up2 = UpConv2x2(128, dtype=self.dtype, name="upconv2")(dec3)
        dec2 = DC(128, 1, name="dec2", **kw)(
            jnp.concatenate([up2, enc2], axis=-1), train, sm
        )
        up1 = UpConv2x2(64, dtype=self.dtype, name="upconv1")(dec2)
        dec1 = DC(64, 1, name="dec1", **kw)(
            jnp.concatenate([up1, enc1], axis=-1), train, sm
        )

        out = nn.Conv(
            self.out_channels, (1, 1), dtype=self.dtype, name="out_conv"
        )(dec1)
        # sigmoid in fp32 for numerical parity regardless of compute dtype
        out = out.astype(jnp.float32)
        if self.apply_sigmoid:
            out = jax.nn.sigmoid(out)
        return out


class UNet(_UNetBase):
    """Classic 4-level U-Net (reference: models/model.py:7-50)."""

    dilations: Tuple[int, int, int, int, int] = (1, 1, 1, 1, 1)


class UNetDC(_UNetBase):
    """U-Net with dilation pyramid 1/2/4/8/16 in the encoder/bottleneck
    (reference: models/model_2.py:10-16)."""

    dilations: Tuple[int, int, int, int, int] = (1, 2, 4, 8, 16)


def init_params(
    model: _UNetBase,
    rng: Optional[jax.Array] = None,
    input_shape: Tuple[int, int, int, int] = (1, 64, 64, 3),
):
    """Initialize variables: returns dict with 'params' (+'batch_stats')."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    x = jnp.zeros(input_shape, jnp.float32)
    return model.init(rng, x, train=False)


def fold_batchnorm(variables) -> dict:
    """Fold BatchNorm statistics into conv weights for inference.

    Given variables = {'params': ..., 'batch_stats': ...} of a use_bn=True
    model, returns {'params': ...} for the same architecture instantiated
    with use_bn=False. For y = BN(conv(x) + b):
        W' = W * gamma / sqrt(var + eps)    (per output channel)
        b' = (b - mean) * gamma / sqrt(var + eps) + beta
    This removes 18 BatchNorm ops from the inference graph; XLA then fuses
    each block into conv+bias+relu.
    """
    params = jax.tree_util.tree_map(lambda x: x, variables["params"])  # copy
    stats = variables.get("batch_stats", {})
    eps = 1e-5
    for block, sub in params.items():
        if not isinstance(sub, dict) or "conv0" not in sub:
            continue
        for i in (0, 1):
            conv = sub[f"conv{i}"]
            if f"bn{i}" not in sub:  # already-folded params: idempotent
                continue
            bn = sub.pop(f"bn{i}")
            st = stats[block][f"bn{i}"]
            scale = bn["scale"] / jnp.sqrt(st["var"] + eps)
            conv["kernel"] = conv["kernel"] * scale[None, None, None, :]
            conv["bias"] = (conv["bias"] - st["mean"]) * scale + bn["bias"]
    return {"params": params}
