"""`torchvision.transforms.functional` shim — imported by the reference's
LMDB prep tool (utils/prepare_lmdb_data.py:14), which is outside the
cross-execution paths; provide the two PIL helpers it names so the module
imports, nothing more."""
from PIL import Image


def resize(img, size, interpolation=Image.BILINEAR):
    if isinstance(size, int):
        w, h = img.size
        short = min(w, h)
        scale = size / short
        size = (round(h * scale), round(w * scale))
    th, tw = size
    return img.resize((tw, th), interpolation)


def center_crop(img, output_size):
    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    th, tw = output_size
    w, h = img.size
    left, top = (w - tw) // 2, (h - th) // 2
    return img.crop((left, top, left + tw, top + th))
