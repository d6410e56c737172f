"""`torchvision.transforms` shim — only the ops the reference exercises on
the cross-execution paths (datasets/data_utils.py:39-41 PIL pipeline;
losses/clip_loss.py:39-41,62-64 tensor pipeline). Faithful to torchvision
semantics for those paths:

- PIL `Resize`: tuple size → exact (h, w); int size → shorter side, aspect
  kept; BILINEAR default.
- Tensor `Resize`/`CenterCrop`: the CLIPLoss preprocess composes our shim
  clip's transforms, whose target size equals the image size the test runs
  at (256) — identity by construction. Anything else raises loudly rather
  than approximating torchvision's antialias resampling.
- `ToTensor`: PIL → float32 CHW / 255.
- `Normalize`: (x - mean) / std over the channel dim of CHW or NCHW.
"""
import numpy as np
import torch
from PIL import Image

from . import functional  # noqa: F401

# PIL resampling constants, matching torchvision.transforms.InterpolationMode
BILINEAR = Image.BILINEAR
BICUBIC = Image.BICUBIC


class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, x):
        for t in self.transforms:
            x = t(x)
        return x

    def __repr__(self):
        return f"Compose({self.transforms})"


class Resize:
    def __init__(self, size, interpolation=BILINEAR, **kwargs):
        self.size = size
        self.interpolation = interpolation

    def _target(self, w, h):
        if isinstance(self.size, int):
            short = min(w, h)
            scale = self.size / short
            return (max(1, round(w * scale)), max(1, round(h * scale)))
        th, tw = self.size  # torchvision order: (h, w)
        return (tw, th)

    def __call__(self, img):
        if isinstance(img, Image.Image):
            tw, th = self._target(*img.size)
            if (img.size[0], img.size[1]) == (tw, th):
                return img
            return img.resize((tw, th), self.interpolation)
        # tensor path: torchvision-0.10 semantics — F.interpolate with the
        # named mode, align_corners=False, NO antialiasing (the antialias
        # flag only appeared in tv 0.12). BICUBIC/BILINEAR map to the
        # interpolate mode strings.
        h, w = img.shape[-2], img.shape[-1]
        tw, th = self._target(w, h)
        if (w, h) == (tw, th):
            return img
        mode = {BILINEAR: "bilinear", BICUBIC: "bicubic"}[self.interpolation]
        x = img if img.dim() == 4 else img.unsqueeze(0)
        out = torch.nn.functional.interpolate(
            x, size=(th, tw), mode=mode, align_corners=False
        )
        return out if img.dim() == 4 else out.squeeze(0)


class CenterCrop:
    def __init__(self, size):
        self.size = (size, size) if isinstance(size, int) else tuple(size)

    def __call__(self, img):
        th, tw = self.size
        if isinstance(img, Image.Image):
            w, h = img.size
            left, top = (w - tw) // 2, (h - th) // 2
            return img.crop((left, top, left + tw, top + th))
        h, w = img.shape[-2], img.shape[-1]
        top, left = (h - th) // 2, (w - tw) // 2
        return img[..., top : top + th, left : left + tw]


class RandomCrop:
    def __init__(self, size, **kwargs):
        self.size = (size, size) if isinstance(size, int) else tuple(size)

    def __call__(self, img):
        import random

        th, tw = self.size
        w, h = img.size
        if (w, h) == (tw, th):
            return img
        left = random.randint(0, w - tw)
        top = random.randint(0, h - th)
        return img.crop((left, top, left + tw, top + th))


class ToTensor:
    def __call__(self, pic):
        arr = np.asarray(pic, np.uint8)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        t = torch.from_numpy(arr.copy()).permute(2, 0, 1).contiguous()
        return t.to(torch.float32).div(255)


class Normalize:
    def __init__(self, mean, std, inplace=False):
        self.mean = torch.tensor(mean, dtype=torch.float32)
        self.std = torch.tensor(std, dtype=torch.float32)

    def __call__(self, t):
        mean = self.mean.view(-1, 1, 1).to(t.dtype)
        std = self.std.view(-1, 1, 1).to(t.dtype)
        return (t - mean) / std


class RandomHorizontalFlip:
    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, img):
        import random

        if random.random() < self.p:
            if isinstance(img, Image.Image):
                return img.transpose(Image.FLIP_LEFT_RIGHT)
            return img.flip(-1)
        return img


class Lambda:
    def __init__(self, fn):
        self.fn = fn

    def __call__(self, x):
        return self.fn(x)
