"""Image IO and tensor conversion (PIL/numpy based; no OpenCV needed).

Equivalents of the reference helpers `img2tensor`/`tensor2img`
(/root/reference/benchmark/utils.py:83-92) and the cv2.imread+BGR→RGB
idiom used across the harnesses — here images are read directly as RGB.
NHWC layout, float32 in [0, 1].
"""
from __future__ import annotations

import numpy as np

try:
    from PIL import Image

    _HAS_PIL = True
except ImportError:  # pragma: no cover
    _HAS_PIL = False


def read_image(path: str) -> np.ndarray:
    """Read an image file -> RGB uint8 [H, W, 3]."""
    if not _HAS_PIL:
        raise RuntimeError("PIL is required for image IO")
    with Image.open(path) as im:
        im = im.convert("RGB")
        return np.asarray(im, dtype=np.uint8)


def write_image(path: str, img: np.ndarray) -> None:
    """Write RGB uint8 [H, W, 3] (or float [0,1], auto-converted)."""
    if img.dtype != np.uint8:
        img = np.clip(np.round(img * 255.0), 0, 255).astype(np.uint8)
    Image.fromarray(img).save(path)


def img2tensor(img: np.ndarray) -> np.ndarray:
    """uint8 RGB [H, W, C>=3] -> float32 NHWC [1, H, W, 3] in [0, 1]."""
    if img.shape[-1] > 3:
        img = img[:, :, :3]
    return (img.astype(np.float32) / 255.0)[None]


def tensor2img(t) -> np.ndarray:
    """float NHWC [1, H, W, 3] in [0, 1] -> uint8 RGB [H, W, 3]."""
    arr = np.asarray(t)
    if arr.ndim == 4:
        arr = arr[0]
    return np.clip(arr * 255.0, 0, 255).astype(np.uint8)


def check_dim_and_resize(images):
    """Resize a list of [H, W, C] images to a common size if they differ
    (reference benchmark/utils.py:284-300)."""
    shapes = {im.shape[:2] for im in images}
    if len(shapes) == 1:
        return list(images)
    from PIL import Image

    h = min(s[0] for s in shapes)
    w = min(s[1] for s in shapes)
    out = []
    for im in images:
        if im.shape[:2] != (h, w):
            im = np.asarray(Image.fromarray(im).resize((w, h), Image.BILINEAR))
        out.append(im)
    return out


def round_to_uint8(t) -> np.ndarray:
    """Rounding used by inference_2frame (demo_2x.py:80-81)."""
    arr = np.asarray(t)
    if arr.ndim == 4:
        arr = arr[0]
    return np.round(np.clip(arr, 0.0, 1.0) * 255.0).astype(np.uint8)
