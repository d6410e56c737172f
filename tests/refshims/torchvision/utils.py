"""`torchvision.utils` shim with the EXACT grid/save semantics of
torchvision==0.10.0 (the reference's pinned version):

- `make_grid` pads on ALL outer edges as well as between tiles, and accepts
  (and silently ignores) unknown keyword arguments — that tolerance is why
  the reference's `tvu.save_image(..., normalization=True)` calls
  (diffusion_latent.py:489,527,544 etc.) do not crash on 0.10.
- `save_image` always re-runs `make_grid`, so saving an already-gridded 3D
  tensor re-borders it with the default padding=2; quantization is
  mul(255).add_(0.5).clamp_(0,255) → uint8 (round-half-up).
"""
import math

import torch
from PIL import Image


def make_grid(tensor, nrow=8, padding=2, normalize=False, value_range=None,
              scale_each=False, pad_value=0, **kwargs):
    if isinstance(tensor, list):
        tensor = torch.stack(tensor, dim=0)
    if tensor.dim() == 2:  # single image H x W
        tensor = tensor.unsqueeze(0)
    if tensor.dim() == 3:  # single image
        if tensor.size(0) == 1:  # single-channel, convert to 3-channel
            tensor = torch.cat((tensor, tensor, tensor), 0)
        tensor = tensor.unsqueeze(0)
    if tensor.dim() == 4 and tensor.size(1) == 1:
        tensor = torch.cat((tensor, tensor, tensor), 1)

    if normalize is True:
        tensor = tensor.clone()

        def norm_ip(img, low, high):
            img.clamp_(min=low, max=high)
            img.sub_(low).div_(max(high - low, 1e-5))

        def norm_range(t, rng):
            if rng is not None:
                norm_ip(t, rng[0], rng[1])
            else:
                norm_ip(t, float(t.min()), float(t.max()))

        if scale_each is True:
            for t in tensor:
                norm_range(t, value_range)
        else:
            norm_range(tensor, value_range)

    if tensor.size(0) == 1:
        return tensor.squeeze(0)

    nmaps = tensor.size(0)
    xmaps = min(nrow, nmaps)
    ymaps = int(math.ceil(float(nmaps) / xmaps))
    height, width = int(tensor.size(2) + padding), int(tensor.size(3) + padding)
    num_channels = tensor.size(1)
    grid = tensor.new_full(
        (num_channels, height * ymaps + padding, width * xmaps + padding),
        pad_value,
    )
    k = 0
    for y in range(ymaps):
        for x in range(xmaps):
            if k >= nmaps:
                break
            grid.narrow(1, y * height + padding, height - padding).narrow(
                2, x * width + padding, width - padding
            ).copy_(tensor[k])
            k = k + 1
    return grid


def save_image(tensor, fp, format=None, **kwargs):
    grid = make_grid(tensor, **kwargs)
    ndarr = (
        grid.mul(255).add_(0.5).clamp_(0, 255)
        .permute(1, 2, 0).to("cpu", torch.uint8).numpy()
    )
    im = Image.fromarray(ndarr)
    im.save(fp, format=format)
