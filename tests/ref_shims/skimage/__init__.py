"""skimage shim: the two dtype helpers the reference's util_image.py imports
at module scope (scripts/util_image.py:14). Semantics match skimage.util."""
import numpy as np


def img_as_float32(img):
    img = np.asarray(img)
    if img.dtype == np.uint8:
        return (img.astype(np.float32) / 255.0)
    return img.astype(np.float32)


def img_as_ubyte(img):
    img = np.asarray(img)
    if img.dtype == np.uint8:
        return img
    return (np.clip(img, -1.0, 1.0) * 255.0).round().astype(np.uint8)
