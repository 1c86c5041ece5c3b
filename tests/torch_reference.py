"""Torch oracle of the reference models + pipeline steps, built independently
from the reference's documented behavior (models/model_2.py,
quantify_droplets_batch.py) for parity testing. skimage is unavailable in
this image, so labeling/regionprops use scipy.ndimage (same 4-connectivity
raster-order semantics)."""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as tF


def build_torch_unetdc(dilations=(1, 2, 4, 8, 16)):
    def double_conv(cin, cout, dilation):
        return tnn.Sequential(
            tnn.Conv2d(cin, cout, 3, padding=dilation, dilation=dilation),
            tnn.BatchNorm2d(cout),
            tnn.ReLU(inplace=True),
            tnn.Conv2d(cout, cout, 3, padding=dilation, dilation=dilation),
            tnn.BatchNorm2d(cout),
            tnn.ReLU(inplace=True),
        )

    class Ref(tnn.Module):
        def __init__(self):
            super().__init__()
            d = dilations
            self.enc1 = double_conv(3, 64, d[0])
            self.enc2 = double_conv(64, 128, d[1])
            self.enc3 = double_conv(128, 256, d[2])
            self.enc4 = double_conv(256, 512, d[3])
            self.bottleneck = double_conv(512, 1024, d[4])
            self.upconv4 = tnn.ConvTranspose2d(1024, 512, 2, 2)
            self.dec4 = double_conv(1024, 512, 1)
            self.upconv3 = tnn.ConvTranspose2d(512, 256, 2, 2)
            self.dec3 = double_conv(512, 256, 1)
            self.upconv2 = tnn.ConvTranspose2d(256, 128, 2, 2)
            self.dec2 = double_conv(256, 128, 1)
            self.upconv1 = tnn.ConvTranspose2d(128, 64, 2, 2)
            self.dec1 = double_conv(128, 64, 1)
            self.out_conv = tnn.Conv2d(64, 1, 1)

        def forward(self, x):
            e1 = self.enc1(x)
            e2 = self.enc2(tF.max_pool2d(e1, 2))
            e3 = self.enc3(tF.max_pool2d(e2, 2))
            e4 = self.enc4(tF.max_pool2d(e3, 2))
            b = self.bottleneck(tF.max_pool2d(e4, 2))
            d4 = self.dec4(torch.cat([self.upconv4(b), e4], 1))
            d3 = self.dec3(torch.cat([self.upconv3(d4), e3], 1))
            d2 = self.dec2(torch.cat([self.upconv2(d3), e2], 1))
            d1 = self.dec1(torch.cat([self.upconv1(d2), e1], 1))
            return torch.sigmoid(self.out_conv(d1))

    return Ref()


def make_decisive_checkpoint(path: str, seed: int = 0,
                             out_scale: float = 300.0, img_size: int = 128):
    """Random-init UNetDC whose output logits are centered on their median
    (over a probe image) and steeply scaled, so predicted masks have real
    structure AND sigmoid saturates — masks become bit-stable across float
    implementations."""
    torch.manual_seed(seed)
    m = build_torch_unetdc().eval()
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 2.0)
        probe = torch.rand(1, 3, img_size, img_size,
                           generator=torch.Generator().manual_seed(123))
        feats_logit = torch.logit(m(probe).clamp(1e-6, 1 - 1e-6))
        center = feats_logit.median()
        m.out_conv.weight.mul_(out_scale)
        m.out_conv.bias.sub_(center).mul_(out_scale)
    torch.save(m.state_dict(), path)
    return m


def reference_quantify(bin_mask, min_area, px_per_um):
    """Reference quantify() (quantify_droplets_batch.py:81-95) with scipy
    in place of skimage."""
    import pandas as pd
    from scipy import ndimage as ndi

    struct4 = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], bool)
    lbl, _ = ndi.label(bin_mask, structure=struct4)
    for l in np.unique(lbl):
        if l and (lbl == l).sum() < min_area:
            lbl[lbl == l] = 0
    lbl, n = ndi.label(lbl > 0, structure=struct4)
    if n == 0:
        return pd.DataFrame()
    idx = np.arange(1, n + 1)
    area = ndi.sum_labels(np.ones_like(lbl), lbl, index=idx).astype(np.int64)
    cy = ndi.sum_labels(np.indices(lbl.shape)[0], lbl, index=idx) / area
    cx = ndi.sum_labels(np.indices(lbl.shape)[1], lbl, index=idx) / area
    df = pd.DataFrame({
        "label": idx, "area": area,
        "equivalent_diameter": np.sqrt(4 * area / np.pi),
        "centroid-0": cy, "centroid-1": cx,
    })
    if px_per_um is not None and not df.empty:
        df["area_sqmicron"] = df["area"] / (px_per_um ** 2)
        df["eq_diam_micron"] = df["equivalent_diameter"] / px_per_um
    return df


def reference_pipeline_one_image(model, img_rgb, img_size, prob_thresh,
                                 min_area, px_per_um, background_radius=50):
    """Full reference preprocess->forward->mask->quantify for one image,
    including the resize-flag bug (cv2 positional dst => INTER_LINEAR)."""
    import cv2

    oh, ow = img_rgb.shape[:2]
    # rolling_ball_correction_rgb (utils/data_loader.py:11-24)
    kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE,
                                       (background_radius, background_radius))
    chans = []
    for c in cv2.split(img_rgb):
        bg = cv2.morphologyEx(c, cv2.MORPH_OPEN, kernel)
        corr = cv2.subtract(c, bg)
        chans.append(cv2.normalize(corr, None, 0, 255, cv2.NORM_MINMAX))
    im = cv2.merge(chans)
    im = cv2.resize(im, (img_size, img_size), cv2.INTER_AREA)  # bug: linear
    x = torch.from_numpy(im.astype(np.float32) / 255.0).permute(2, 0, 1)
    with torch.no_grad():
        probs = model(x[None])[0, 0].numpy()
    mask512 = (probs > prob_thresh).astype(np.uint8)
    mask = cv2.resize(mask512, (ow, oh), cv2.INTER_NEAREST)  # bug: linear
    df = reference_quantify(mask, min_area, px_per_um)
    return mask, df
