"""Skybox cubemap loading (reference: Scene::LoadSkybox, scene.cpp:333-381).

Loads the six face images right,left,top,bottom,front,back as float arrays
with lower-left origin (DevIL's IL_ORIGIN_LOWER_LEFT). All faces are resized
to a common square resolution so the cubemap ships as one [6, H, W, 3] array.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

FACES = ("right", "left", "top", "bottom", "front", "back")
_EXTS = (".jpg", ".jpeg", ".png")


def load_skybox_dir(sky_dir: str) -> Optional[np.ndarray]:
    """Return [6, H, W, 3] uint8, or None if the dir is missing.

    Raw bytes, exactly like the reference keeps them (scene.cpp:333-381);
    lookups convert texels to float as u8/255.99 AFTER the gather
    (ops/shade.skybox_color — reference u8tofloat semantics, maths.h). u8
    storage is also the TPU-performance choice: 72 MB of HBM instead of
    288, 4x less gather traffic, and it enables the megakernel epilogue's
    packed-u32 single-element gather.

    The reference exits the process on a missing face (scene.cpp:358); we
    degrade to no-skybox so scenes like balls_box.p3f (whose ``env skybox1``
    dir does not exist — SURVEY.md quirk #9) still load.
    """
    try:
        from PIL import Image
    except ImportError:  # pragma: no cover
        return None
    if not os.path.isdir(sky_dir):
        return None

    imgs = []
    for face in FACES:
        path = None
        for ext in _EXTS:
            cand = os.path.join(sky_dir, face + ext)
            if os.path.exists(cand):
                path = cand
                break
        if path is None:
            return None
        im = Image.open(path).convert("RGB")
        arr = np.asarray(im, np.uint8)
        imgs.append(arr[::-1])  # flip to lower-left origin

    size = max(max(a.shape[0], a.shape[1]) for a in imgs)
    out = np.zeros((6, size, size, 3), np.uint8)
    for i, a in enumerate(imgs):
        if a.shape[0] != size or a.shape[1] != size:
            im = Image.fromarray(a[::-1]).resize((size, size))
            a = np.asarray(im, np.uint8)[::-1]
        out[i] = a
    return out
