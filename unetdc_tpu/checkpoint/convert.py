"""Convert between reference PyTorch state dicts and Flax variable pytrees.

Reference state-dict key structure (implied by models/model_2.py:6-32):
    enc{1..4}.{0,3}.{weight,bias}           Conv2d  (O, I, 3, 3)
    enc{1..4}.{1,4}.{weight,bias,running_mean,running_var,
                     num_batches_tracked}   BatchNorm2d
    bottleneck.* / dec{4..1}.*              same Sequential layout
    upconv{4..1}.{weight,bias}              ConvTranspose2d (I, O, 2, 2)
    out_conv.{weight,bias}                  Conv2d (O, I, 1, 1)

Flax layout produced by unetdc_tpu.models.unet:
    params/<block>/conv{0,1}/{kernel (HWIO), bias}
    params/<block>/bn{0,1}/{scale, bias}
    batch_stats/<block>/bn{0,1}/{mean, var}
    params/upconv{n}/{kernel (I,O,2,2), bias}
    params/out_conv/{kernel (1,1,I,O), bias}
"""

from __future__ import annotations

from typing import Dict

import numpy as np

_BLOCKS = [
    "enc1", "enc2", "enc3", "enc4", "bottleneck",
    "dec4", "dec3", "dec2", "dec1",
]
_UPCONVS = ["upconv4", "upconv3", "upconv2", "upconv1"]
# torch Sequential index -> (our name, kind)
_SEQ = {0: ("conv0", "conv"), 1: ("bn0", "bn"), 3: ("conv1", "conv"), 4: ("bn1", "bn")}


def torch_state_dict_to_variables(sd: Dict[str, np.ndarray]) -> dict:
    """Reference .pth state dict -> {'params': ..., 'batch_stats': ...}."""
    params: dict = {}
    stats: dict = {}
    for block in _BLOCKS:
        pb: dict = {}
        sb: dict = {}
        for seq_idx, (name, kind) in _SEQ.items():
            if kind == "conv":
                w = sd[f"{block}.{seq_idx}.weight"]  # (O, I, 3, 3)
                b = sd[f"{block}.{seq_idx}.bias"]
                pb[name] = {
                    "kernel": np.transpose(w, (2, 3, 1, 0)),  # HWIO
                    "bias": b,
                }
            else:
                pb[name] = {
                    "scale": sd[f"{block}.{seq_idx}.weight"],
                    "bias": sd[f"{block}.{seq_idx}.bias"],
                }
                sb[name] = {
                    "mean": sd[f"{block}.{seq_idx}.running_mean"],
                    "var": sd[f"{block}.{seq_idx}.running_var"],
                }
        params[block] = pb
        stats[block] = sb
    for up in _UPCONVS:
        params[up] = {
            "kernel": sd[f"{up}.weight"],  # (I, O, 2, 2) kept as-is
            "bias": sd[f"{up}.bias"],
        }
    params["out_conv"] = {
        "kernel": np.transpose(sd["out_conv.weight"], (2, 3, 1, 0)),
        "bias": sd["out_conv.bias"],
    }
    return {"params": params, "batch_stats": stats}


def variables_to_torch_state_dict(variables: dict) -> Dict[str, np.ndarray]:
    """Inverse conversion, so natively-trained weights can be exported to the
    reference's .pth consumers (schema only; saving uses torch if present)."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd: Dict[str, np.ndarray] = {}
    for block in _BLOCKS:
        for seq_idx, (name, kind) in _SEQ.items():
            if kind == "conv":
                k = np.asarray(params[block][name]["kernel"])
                sd[f"{block}.{seq_idx}.weight"] = np.transpose(k, (3, 2, 0, 1))
                sd[f"{block}.{seq_idx}.bias"] = np.asarray(
                    params[block][name]["bias"])
            else:
                sd[f"{block}.{seq_idx}.weight"] = np.asarray(
                    params[block][name]["scale"])
                sd[f"{block}.{seq_idx}.bias"] = np.asarray(
                    params[block][name]["bias"])
                st = stats[block][name]
                sd[f"{block}.{seq_idx}.running_mean"] = np.asarray(st["mean"])
                sd[f"{block}.{seq_idx}.running_var"] = np.asarray(st["var"])
                sd[f"{block}.{seq_idx}.num_batches_tracked"] = np.asarray(
                    0, dtype=np.int64)
    for up in _UPCONVS:
        sd[f"{up}.weight"] = np.asarray(params[up]["kernel"])
        sd[f"{up}.bias"] = np.asarray(params[up]["bias"])
    k = np.asarray(params["out_conv"]["kernel"])
    sd["out_conv.weight"] = np.transpose(k, (3, 2, 0, 1))
    sd["out_conv.bias"] = np.asarray(params["out_conv"]["bias"])
    return sd
