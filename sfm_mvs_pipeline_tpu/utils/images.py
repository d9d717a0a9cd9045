"""Host-side image IO: enumerate, decode, resize, colorize support.

Replaces the reference's CameraShot::loadMImage / Scene::colorizePointcloud
image handling (ref: src/photogrammetrie/common/CameraShot.cpp:37-48,
Scene.cpp:569-617). Decoding is host-side (cv2) — the TPU sees only dense
arrays.
"""

from __future__ import annotations

import os

import numpy as np

_IMG_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".tif", ".tiff", ".webp"}


def list_images(directory: str) -> list[str]:
    """Sorted image paths in a directory (ref sorts lexicographically;
    PhotogrammetrieCli.cpp:252-280)."""
    out = [
        os.path.join(directory, f)
        for f in sorted(os.listdir(directory))
        if os.path.splitext(f)[1].lower() in _IMG_EXTS
    ]
    if not out:
        raise FileNotFoundError(f"no images found in {directory}")
    return out


def load_gray_batch(
    paths: list[str], size: tuple[int, int] | None = None
) -> tuple[np.ndarray, tuple[int, int]]:
    """Load images as a (B, H, W) float32 [0,1] batch, resizing everything to
    the first image's resolution (the reference ties all shots to one shared
    camera resolution; CameraShot.cpp:37-48). Returns (batch, (width, height))."""
    import cv2

    imgs = []
    wh = size
    for p in paths:
        img = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
        if img is None:
            raise IOError(f"cannot read image: {p}")
        if wh is None:
            wh = (img.shape[1], img.shape[0])
        if (img.shape[1], img.shape[0]) != wh:
            img = cv2.resize(img, wh, interpolation=cv2.INTER_AREA)
        imgs.append(img.astype(np.float32) / 255.0)
    return np.stack(imgs), wh


def load_rgb(path: str, size: tuple[int, int] | None = None) -> np.ndarray:
    """Load one image as (H, W, 3) uint8 RGB."""
    import cv2

    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise IOError(f"cannot read image: {path}")
    if size is not None and (img.shape[1], img.shape[0]) != size:
        img = cv2.resize(img, size, interpolation=cv2.INTER_AREA)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def colorize_points(scene) -> None:
    """Fill scene.colors by sampling each point's first-origin pixel pair and
    averaging, one image load per shot (ref: Scene::colorizePointcloud,
    Scene.cpp:569-617 — samples ONE origin's left/right pixels and averages,
    short-circuiting after the first origin)."""
    n = scene.n_points
    acc = np.zeros((n, 3), np.float64)
    cnt = np.zeros(n, np.float64)
    # first two observations per point = the first origin's pixel pair
    order = np.argsort(scene.obs_point, kind="stable")
    op = scene.obs_point[order]
    start = np.searchsorted(op, np.arange(n), side="left")
    end = np.searchsorted(op, np.arange(n), side="right")
    take = []  # (obs_index) list for first up to 2 obs of each point
    for p in range(n):
        for k in range(start[p], min(end[p], start[p] + 2)):
            take.append(order[k])
    take = np.asarray(take, np.int64)
    if len(take) == 0:
        return
    shots = scene.obs_shot[take]
    uvs = scene.obs_uv[take]
    pts = scene.obs_point[take]
    w, h = scene.image_size
    for s in np.unique(shots):
        img = load_rgb(scene.image_paths[s], scene.image_size)
        sel = shots == s
        x = np.clip(np.round(uvs[sel, 0]).astype(int), 0, w - 1)
        y = np.clip(np.round(uvs[sel, 1]).astype(int), 0, h - 1)
        np.add.at(acc, pts[sel], img[y, x].astype(np.float64))
        np.add.at(cnt, pts[sel], 1.0)
    ok = cnt > 0
    rgb = np.zeros((n, 3), np.uint8)
    rgb[ok] = np.clip(acc[ok] / cnt[ok, None], 0, 255).astype(np.uint8)
    scene.colors = np.concatenate(
        [rgb, np.full((n, 1), 255, np.uint8)], axis=1
    )
