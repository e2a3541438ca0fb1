"""Host-side mask-volume utilities.

Re-design of /root/reference/utils/tools.py:7-23 ``clean_volume`` (defined
twice there, :7 and :34, and never called — SURVEY.md §7.5): keep only the
largest 26-connected component of a boolean mask volume. Uses
scipy.ndimage instead of skimage (not in this image); runs on the host at
mesh-extraction time, outside jit.
"""

from __future__ import annotations

import numpy as np


def clean_volume(mask_volume: np.ndarray) -> np.ndarray:
    """Largest connected component of a (X, Y, Z) boolean/0-1 mask volume.

    26-connectivity (the reference's ``measure.label(connectivity=3)``).
    Returns a mask of the same shape and dtype float32 in {0, 1}; an
    all-empty input is returned unchanged.
    """
    from scipy import ndimage

    mask = np.asarray(mask_volume) > 0
    structure = np.ones((3, 3, 3), bool)  # 26-connected
    labels, num = ndimage.label(mask, structure=structure)
    if num < 1:
        return np.asarray(mask_volume, np.float32)
    counts = np.bincount(labels.ravel())
    counts[0] = 0  # background
    keep = int(counts.argmax())
    return (labels == keep).astype(np.float32)
