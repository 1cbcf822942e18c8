"""Image output (reference: saveImgFile via DevIL, main.cpp:261-276).

The renderer produces float images with row 0 = bottom scanline (the
reference's framebuffer convention). PNG rows run top-down, so we flip on
save/load.
"""
from __future__ import annotations

import numpy as np


def u8_from_float(x: np.ndarray) -> np.ndarray:
    """u8fromfloat (maths.h:113-117): x*255.99, saturated at 255."""
    v = np.asarray(x, np.float32) * 255.99
    return np.clip(v, 0.0, 255.0).astype(np.uint8)


def float_from_u8(x: np.ndarray) -> np.ndarray:
    """u8tofloat (maths.h:120-123)."""
    return np.asarray(x, np.float32) / 255.99


def to_u8_device(image):
    """u8fromfloat on device — transfer 4x less through slow device->host
    links (the remote-TPU tunnel reads back at ~20 KB/s)."""
    import jax.numpy as jnp

    v = jnp.asarray(image) * 255.99
    return jnp.clip(v, 0.0, 255.0).astype(jnp.uint8)


def save_png(path: str, image) -> None:
    """image: [H, W, 3] float in [0,1] (or uint8), row 0 = bottom."""
    from PIL import Image

    arr = np.asarray(image)
    if arr.dtype != np.uint8:
        arr = u8_from_float(arr)
    Image.fromarray(arr[::-1], "RGB").save(path)


def load_png(path: str) -> np.ndarray:
    """Returns [H, W, 3] float in [0,1], row 0 = bottom."""
    from PIL import Image

    arr = np.asarray(Image.open(path).convert("RGB"))
    return float_from_u8(arr[::-1])
