"""Minimal PLY reader/writer (numpy, no external deps).

Replaces the reference's use of the ``plyfile`` package
(gaustudio/models/base.py:3, datasets/utils.py) for loading/saving Gaussian
checkpoints (Inria ``point_cloud.ply`` layout) and point clouds.  Supports
binary_little_endian and ascii, element ``vertex`` (+ ``face`` for meshes).
"""

from __future__ import annotations

import io
from typing import Dict, List, Optional, Tuple

import numpy as np

_PLY_TO_NP = {
    "char": "i1", "int8": "i1",
    "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2",
    "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4",
    "uint": "u4", "uint32": "u4",
    "float": "f4", "float32": "f4",
    "double": "f8", "float64": "f8",
}
_NP_TO_PLY = {
    "int8": "char", "uint8": "uchar", "int16": "short", "uint16": "ushort",
    "int32": "int", "uint32": "uint", "float32": "float", "float64": "double",
}


def read_ply(path: str) -> Dict[str, Dict[str, np.ndarray]]:
    """Read a PLY file into {element_name: {property_name: array}}.

    List properties (e.g. face vertex_indices) are returned as 2D arrays when
    uniform-length, else object arrays.
    """
    with open(path, "rb") as f:
        data = f.read()

    header_end = data.find(b"end_header\n")
    if header_end < 0:
        raise ValueError(f"not a PLY file: {path}")
    header = data[:header_end].decode("ascii", "replace").splitlines()
    body = data[header_end + len(b"end_header\n"):]

    if header[0].strip() != "ply":
        raise ValueError(f"not a PLY file: {path}")
    fmt = None
    elements: List[Tuple[str, int, list]] = []  # (name, count, [(kind, ...)])
    for line in header[1:]:
        parts = line.strip().split()
        if not parts or parts[0] == "comment":
            continue
        if parts[0] == "format":
            fmt = parts[1]
        elif parts[0] == "element":
            elements.append((parts[1], int(parts[2]), []))
        elif parts[0] == "property":
            if parts[1] == "list":
                elements[-1][2].append(("list", _PLY_TO_NP[parts[2]], _PLY_TO_NP[parts[3]], parts[4]))
            else:
                elements[-1][2].append(("scalar", _PLY_TO_NP[parts[1]], parts[2]))

    out: Dict[str, Dict[str, np.ndarray]] = {}
    if fmt == "ascii":
        text_rows = body.decode("ascii").split("\n")
        row_i = 0
        for name, count, props in elements:
            cols: Dict[str, list] = {p[-1]: [] for p in props}
            for _ in range(count):
                vals = text_rows[row_i].split()
                row_i += 1
                vi = 0
                for p in props:
                    if p[0] == "scalar":
                        cols[p[2]].append(float(vals[vi]))
                        vi += 1
                    else:
                        ln = int(vals[vi])
                        vi += 1
                        cols[p[3]].append([float(v) for v in vals[vi:vi + ln]])
                        vi += ln
            out[name] = {
                k: np.asarray(v) for k, v in cols.items()
            }
            for p in props:
                if p[0] == "scalar":
                    out[name][p[2]] = out[name][p[2]].astype(p[1])
        return out

    if fmt not in ("binary_little_endian", "binary_big_endian"):
        raise ValueError(f"unsupported PLY format {fmt}")
    endian = "<" if fmt == "binary_little_endian" else ">"

    offset = 0
    for name, count, props in elements:
        if all(p[0] == "scalar" for p in props):
            dtype = np.dtype([(p[2], endian + p[1]) for p in props])
            arr = np.frombuffer(body, dtype=dtype, count=count, offset=offset)
            offset += dtype.itemsize * count
            out[name] = {p[2]: np.ascontiguousarray(arr[p[2]]) for p in props}
        else:
            # general path with list properties (row by row)
            cols = {p[-1]: [] for p in props}
            buf = memoryview(body)
            for _ in range(count):
                for p in props:
                    if p[0] == "scalar":
                        v = np.frombuffer(buf, endian + p[1], 1, offset)[0]
                        offset += np.dtype(p[1]).itemsize
                        cols[p[2]].append(v)
                    else:
                        ln = int(np.frombuffer(buf, endian + p[1], 1, offset)[0])
                        offset += np.dtype(p[1]).itemsize
                        v = np.frombuffer(buf, endian + p[2], ln, offset)
                        offset += np.dtype(p[2]).itemsize * ln
                        cols[p[3]].append(np.asarray(v))
            out[name] = {}
            for p in props:
                key = p[-1]
                vals = cols[key]
                if p[0] == "list" and vals and all(len(v) == len(vals[0]) for v in vals):
                    out[name][key] = np.stack(vals)
                else:
                    out[name][key] = np.asarray(vals)
    return out


def write_ply(
    path: str,
    vertex_props: Dict[str, np.ndarray],
    faces: Optional[np.ndarray] = None,
    ascii_format: bool = False,
    comments: Optional[List[str]] = None,
) -> None:
    """Write a PLY with a ``vertex`` element (+ optional triangle ``face``).

    ``vertex_props`` is ordered {name: 1D array}; all arrays must share
    length.  Matches the Inria checkpoint layout when given the attribute
    order of VanillaPointCloud.export (gaustudio/models/vanilla_sg.py:144-181).
    """
    names = list(vertex_props.keys())
    n = len(next(iter(vertex_props.values())))
    arrs = {k: np.asarray(v).reshape(n) for k, v in vertex_props.items()}

    header = io.StringIO()
    header.write("ply\n")
    header.write("format ascii 1.0\n" if ascii_format else "format binary_little_endian 1.0\n")
    for c in comments or []:
        header.write(f"comment {c}\n")
    header.write(f"element vertex {n}\n")
    for k in names:
        ply_t = _NP_TO_PLY[arrs[k].dtype.name]
        header.write(f"property {ply_t} {k}\n")
    if faces is not None:
        header.write(f"element face {len(faces)}\n")
        header.write("property list uchar int vertex_indices\n")
    header.write("end_header\n")

    with open(path, "wb") as f:
        f.write(header.getvalue().encode("ascii"))
        if ascii_format:
            rows = np.stack([arrs[k].astype(np.float64) for k in names], axis=1)
            np.savetxt(f, rows, fmt="%.8g")
            if faces is not None:
                fc = np.asarray(faces, np.int64)
                np.savetxt(f, np.concatenate([np.full((len(fc), 1), 3), fc], 1), fmt="%d")
        else:
            rec = np.empty(n, dtype=[(k, "<" + arrs[k].dtype.str[1:]) for k in names])
            for k in names:
                rec[k] = arrs[k]
            f.write(rec.tobytes())
            if faces is not None:
                fc = np.asarray(faces, np.int32)
                frec = np.empty(len(fc), dtype=[("n", "u1"), ("v", "<i4", (3,))])
                frec["n"] = 3
                frec["v"] = fc
                f.write(frec.tobytes())


def store_ply(path: str, xyz: np.ndarray, rgb: np.ndarray, normals=None) -> None:
    """Port of storePly (gaustudio/datasets/utils.py:9-24): xyz + nx,ny,nz +
    uint8 RGB."""
    if normals is None:
        normals = np.zeros_like(xyz)
    props = {
        "x": xyz[:, 0].astype(np.float32),
        "y": xyz[:, 1].astype(np.float32),
        "z": xyz[:, 2].astype(np.float32),
        "nx": normals[:, 0].astype(np.float32),
        "ny": normals[:, 1].astype(np.float32),
        "nz": normals[:, 2].astype(np.float32),
        "red": rgb[:, 0].astype(np.uint8),
        "green": rgb[:, 1].astype(np.uint8),
        "blue": rgb[:, 2].astype(np.uint8),
    }
    write_ply(path, props)


def fetch_ply(path: str):
    """Port of fetchPly semantics: returns (xyz, rgb[0..1] or None, normals or None)."""
    ply = read_ply(path)
    v = ply["vertex"]
    xyz = np.stack([v["x"], v["y"], v["z"]], axis=1).astype(np.float32)
    rgb = None
    if "red" in v:
        rgb = np.stack([v["red"], v["green"], v["blue"]], axis=1).astype(np.float32)
        if rgb.max() > 1.0:
            rgb = rgb / 255.0
    normals = None
    if "nx" in v:
        normals = np.stack([v["nx"], v["ny"], v["nz"]], axis=1).astype(np.float32)
    return xyz, rgb, normals
