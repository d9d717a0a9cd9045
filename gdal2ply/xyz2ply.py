"""XYZ elevation raster -> PLY ground-truth mesh converter.

Python replacement for the reference's Groovy utilities
(ref: /root/reference/gdal2ply/XYZ2PLY.groovy, XYZ2RECT.groovy): converts a
GDAL-exported XYZ grid (one "x y z" line per raster cell, row-major) into a
PLY mesh used as DEM ground truth for comparing reconstructions
(thesis context, CMakeLists.txt:88).

Options mirror gdal2ply.sh: crop rectangle, triangles vs quads, face flip,
centering, binary PLY, axis mirroring, optional texture coordinates.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def read_xyz(path: str) -> tuple[np.ndarray, int, int]:
    """Load a row-major XYZ grid. Returns (points (H*W, 3), W, H)."""
    data = np.loadtxt(path, dtype=np.float64)
    if data.ndim != 2 or data.shape[1] < 3:
        raise ValueError("expected 'x y z' per line")
    xs = data[:, 0]
    # raster width = run length of the first row (x changes fastest)
    w = 1
    while w < len(xs) and xs[w] != xs[0]:
        w += 1
    h = len(xs) // w
    return data[: w * h, :3], w, h


def xyz_to_mesh(
    pts: np.ndarray,
    w: int,
    h: int,
    rect: tuple[int, int, int, int] | None = None,
    triangles: bool = True,
    flip_faces: bool = False,
    center: bool = False,
    mirror: tuple[bool, bool, bool] = (False, False, False),
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Grid -> (vertices, faces, uv)."""
    grid = pts.reshape(h, w, 3)
    if rect is not None:
        x0, y0, rw, rh = rect
        grid = grid[y0 : y0 + rh, x0 : x0 + rw]
        h, w = grid.shape[:2]
    verts = grid.reshape(-1, 3).copy()
    for ax in range(3):
        if mirror[ax]:
            verts[:, ax] = -verts[:, ax]
    if center:
        verts -= verts.mean(axis=0)

    idx = np.arange(h * w).reshape(h, w)
    a = idx[:-1, :-1].ravel()
    b = idx[:-1, 1:].ravel()
    c = idx[1:, :-1].ravel()
    d = idx[1:, 1:].ravel()
    if triangles:
        faces = np.concatenate(
            [np.stack([a, c, b], 1), np.stack([b, c, d], 1)]
        )
    else:
        faces = np.stack([a, c, d, b], 1)
    if flip_faces:
        faces = faces[:, ::-1]

    uy, ux = np.mgrid[0:h, 0:w]
    uv = np.stack(
        [(ux / max(w - 1, 1)).ravel(), (1.0 - uy / max(h - 1, 1)).ravel()], 1
    )
    return verts, faces, uv


def write_ply(
    path: str,
    verts: np.ndarray,
    faces: np.ndarray,
    uv: np.ndarray | None = None,
    binary: bool = True,
    texture_file: str | None = None,
) -> None:
    n_per_face = faces.shape[1]
    header = [
        "ply",
        "format binary_little_endian 1.0" if binary else "format ascii 1.0",
    ]
    if texture_file:
        header.append(f"comment TextureFile {texture_file}")
    header += [
        f"element vertex {len(verts)}",
        "property float x",
        "property float y",
        "property float z",
    ]
    if uv is not None:
        header += ["property float s", "property float t"]
    header += [
        f"element face {len(faces)}",
        "property list uchar int vertex_indices",
        "end_header",
    ]
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode())
        if binary:
            fields = [("x", "<f4"), ("y", "<f4"), ("z", "<f4")]
            if uv is not None:
                fields += [("s", "<f4"), ("t", "<f4")]
            rec = np.empty(len(verts), dtype=fields)
            rec["x"], rec["y"], rec["z"] = verts.T.astype(np.float32)
            if uv is not None:
                rec["s"], rec["t"] = uv.T.astype(np.float32)
            rec.tofile(f)
            frec = np.empty(
                len(faces),
                dtype=[("n", "u1")] + [(f"i{k}", "<i4") for k in range(n_per_face)],
            )
            frec["n"] = n_per_face
            for k in range(n_per_face):
                frec[f"i{k}"] = faces[:, k]
            frec.tofile(f)
        else:
            for i, v in enumerate(verts):
                line = f"{v[0]} {v[1]} {v[2]}"
                if uv is not None:
                    line += f" {uv[i][0]} {uv[i][1]}"
                f.write((line + "\n").encode())
            for face in faces:
                f.write(
                    (f"{n_per_face} " + " ".join(map(str, face)) + "\n").encode()
                )


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-i", "--input", required=True, help="XYZ input file")
    ap.add_argument("-o", "--output", default=None, help="output prefix")
    ap.add_argument("--rect", default=None, help="x,y,width,height crop")
    ap.add_argument("-t", "--triangles", action="store_true")
    ap.add_argument("-f", "--flip-faces", action="store_true")
    ap.add_argument("-c", "--center", action="store_true")
    ap.add_argument("-b", "--binary", action="store_true")
    ap.add_argument("--texture", default=None, help="texture image filename")
    ap.add_argument("--mirror", default="", help="any of xyz")
    args = ap.parse_args(argv)

    pts, w, h = read_xyz(args.input)
    rect = None
    if args.rect:
        rect = tuple(int(v) for v in args.rect.split(","))
    verts, faces, uv = xyz_to_mesh(
        pts, w, h,
        rect=rect,
        triangles=args.triangles,
        flip_faces=args.flip_faces,
        center=args.center,
        mirror=tuple(ax in args.mirror.lower() for ax in "xyz"),
    )
    out = (args.output or args.input.rsplit(".", 1)[0]) + ".ply"
    write_ply(
        out, verts, faces,
        uv=uv if args.texture else None,
        binary=args.binary,
        texture_file=args.texture,
    )
    print(f"{out}: {len(verts)} vertices, {len(faces)} faces")
    return 0


if __name__ == "__main__":
    sys.exit(main())
