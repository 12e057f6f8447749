"""Shared image output helpers."""

from __future__ import annotations

import numpy as np


def to_uint8(images01) -> np.ndarray:
    """[0, 1] float images -> uint8, ROUNDING to nearest.

    The reference/diffusers contract is ``(images * 255).round()``; a bare
    ``astype(np.uint8)`` truncates, biasing every pixel low by an average of
    half an LSB (0.9999 -> 254 instead of 255).  One definition so the HTTP
    service and ``xDiTParallel.save`` cannot drift (the [-1,1]-vs-[0,1] class
    of bug fixed in 5cd46da).
    """
    arr = np.asarray(images01, np.float32)
    return np.clip(np.round(arr * 255.0), 0, 255).astype(np.uint8)
