"""Read/write folders of line-crop images
(reference: pero_ocr/line_images_io.py:5-20)."""

from __future__ import annotations

import os
from typing import List, Tuple

import cv2
import numpy as np

_IMAGE_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp", ".tif", ".tiff")


def read_images(path: str) -> Tuple[List[np.ndarray], List[str]]:
    """Returns (images, names-without-extension), sorted by name."""
    names = sorted(
        f for f in os.listdir(path)
        if f.lower().endswith(_IMAGE_EXTENSIONS)
    )
    images = []
    for name in names:
        img = cv2.imread(os.path.join(path, name))
        if img is not None:
            images.append(img)
    return images, [os.path.splitext(n)[0] for n in names]


def write_images(path: str, images, names, extension: str = ".jpg") -> None:
    os.makedirs(path, exist_ok=True)
    for img, name in zip(images, names):
        cv2.imwrite(os.path.join(path, name + extension), img)
