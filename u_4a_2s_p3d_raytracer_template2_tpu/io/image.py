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


def preview_u8(image, cols: int = 80):
    """Box-downsample a device float image to a terminal-preview-sized u8
    array ON DEVICE. [H, W, 3] -> [2*rows, cols, 3] u8 (row 0 = bottom),
    sized for the ANSI half-block renderer (two image rows per text line).

    Everything stays on device until the final tiny array: at 80 cols the
    readback is ~11 KB — ~0.5 s through the remote tunnel's ~20 KB/s
    device->host link, which is what makes a live terminal viewer feasible
    at all (a float 512^2 frame would be 3 MB ≈ minutes)."""
    import jax
    import jax.numpy as jnp

    img = jnp.asarray(image)
    h, w = img.shape[0], img.shape[1]
    cols = max(2, min(cols, w))
    # keep the aspect ratio: a cell is 1 char wide and 2 image rows tall
    rows2 = max(2, (h * cols) // max(w, 1)) & ~1
    small = jax.image.resize(img, (rows2, cols, 3), method="linear")
    return to_u8_device(small)


def ansi_halfblock(u8_img) -> str:
    """[H, W, 3] u8 (row 0 = bottom) -> 24-bit-color terminal image, one
    ``▀`` (upper half block) per character cell: foreground = the upper of
    two image rows, background = the lower. The terminal twin of the
    reference viewer's per-frame GL point blit (drawPoints,
    main.cpp:237-259)."""
    a = np.asarray(u8_img)
    h = a.shape[0] & ~1
    lines = []
    for top in range(h - 1, 0, -2):
        up = a[top]
        lo = a[top - 1]
        parts = []
        for x in range(a.shape[1]):
            parts.append(
                f"\x1b[38;2;{up[x, 0]};{up[x, 1]};{up[x, 2]}m"
                f"\x1b[48;2;{lo[x, 0]};{lo[x, 1]};{lo[x, 2]}m▀")
        lines.append("".join(parts) + "\x1b[0m")
    return "\n".join(lines)


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
