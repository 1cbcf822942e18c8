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
    """Return [6, H, W, 3] float32 in [0,1], or None if the dir is missing.

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
        arr = np.asarray(im, np.float32) / 255.99
        imgs.append(arr[::-1])  # flip to lower-left origin

    size = max(max(a.shape[0], a.shape[1]) for a in imgs)
    out = np.zeros((6, size, size, 3), np.float32)
    for i, a in enumerate(imgs):
        if a.shape[0] != size or a.shape[1] != size:
            im = Image.fromarray((a[::-1] * 255.99).astype(np.uint8))
            im = im.resize((size, size))
            a = np.asarray(im, np.float32)[::-1] / 255.99
        out[i] = a
    return out
