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


def scale_letterbox(
    img: np.ndarray, dst_size: tuple[int, int], fill=0
) -> np.ndarray:
    """Aspect-preserving resize into (w, h) with centered letterbox padding
    (ref: OpenCvUtils::scale, src/photogrammetrie/util/OpenCvUtils.cpp:93-140)."""
    import cv2

    dw, dh = dst_size
    h, w = img.shape[:2]
    if (w, h) == (dw, dh):
        return img.copy()
    factor = min(dw / w, dh / h)
    sw = max(int(round(w * factor)), 1)
    sh = max(int(round(h * factor)), 1)
    scaled = cv2.resize(img, (sw, sh), interpolation=cv2.INTER_AREA)
    shape = (dh, dw) + img.shape[2:]
    out = np.full(shape, fill, dtype=img.dtype)
    x0 = abs(dw - sw) // 2
    y0 = abs(dh - sh) // 2
    out[y0 : y0 + sh, x0 : x0 + sw] = scaled
    return out


def scale_points(points: np.ndarray, scale: float) -> np.ndarray:
    """Uniformly scale 2D points (ref: OpenCvUtils::scalePoints,
    OpenCvUtils.cpp:142-146)."""
    return np.asarray(points) * scale


def scaled_intrinsics(K: np.ndarray, scale: float) -> np.ndarray:
    """Scale the first two rows of a 3x3 K for a resized image
    (ref: OpenCvUtils::scaledK, OpenCvUtils.h:194-213)."""
    K = np.asarray(K, np.float64)
    if K.shape != (3, 3):
        raise ValueError("expected a 3x3 camera matrix")
    out = K.copy()
    out[:2] *= scale
    return out


def stereo_matcher_roi(
    src_size: tuple[int, int],
    min_disparity: int,
    num_disparities: int,
    block_size: int,
) -> tuple[int, int, int, int]:
    """Valid-disparity ROI (x, y, w, h) of a block stereo matcher
    (ref: OpenCvUtils::computeStereoMatcherROI, OpenCvUtils.cpp:148-163)."""
    w, h = src_size
    half = block_size // 2
    max_disparity = min_disparity + num_disparities - 1
    x_min = max_disparity + half
    x_max = w + min_disparity - half
    y_min = half
    y_max = h - half
    return (x_min, y_min, x_max - x_min, y_max - y_min)


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
