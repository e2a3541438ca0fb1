"""Minimal binary/ascii PLY mesh IO (replaces the reference's trimesh
dependency for export, runner.py:229-235)."""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np


def write_ply(path: str, vertices: np.ndarray, faces: np.ndarray) -> None:
    """Write a binary-little-endian PLY with float vertices and int faces."""
    vertices = np.ascontiguousarray(vertices, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    header = (
        "ply\n"
        "format binary_little_endian 1.0\n"
        f"element vertex {len(vertices)}\n"
        "property float x\nproperty float y\nproperty float z\n"
        f"element face {len(faces)}\n"
        "property list uchar int vertex_indices\n"
        "end_header\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(vertices.tobytes())
        counts = np.full((len(faces), 1), 3, np.uint8)
        face_rec = np.zeros(len(faces), dtype=[("n", "u1"), ("idx", "<i4", 3)])
        face_rec["n"] = 3
        face_rec["idx"] = faces
        f.write(face_rec.tobytes())


def read_ply(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Read vertices/faces from binary-LE or ascii PLY (triangles only,
    extra per-vertex properties are skipped)."""
    with open(path, "rb") as f:
        data = f.read()
    header_end = data.index(b"end_header\n") + len(b"end_header\n")
    header = data[:header_end].decode("ascii", "replace").splitlines()
    body = data[header_end:]

    fmt = "binary_little_endian"
    n_vert = n_face = 0
    vert_props = []
    in_vertex = False
    for line in header:
        parts = line.split()
        if not parts:
            continue
        if parts[0] == "format":
            fmt = parts[1]
        elif parts[0] == "element":
            in_vertex = parts[1] == "vertex"
            if parts[1] == "vertex":
                n_vert = int(parts[2])
            elif parts[1] == "face":
                n_face = int(parts[2])
        elif parts[0] == "property" and in_vertex and parts[1] != "list":
            vert_props.append((parts[2], parts[1]))

    type_map = {"float": "<f4", "float32": "<f4", "double": "<f8",
                "uchar": "u1", "uint8": "u1", "int": "<i4", "int32": "<i4"}

    if fmt == "ascii":
        text = body.decode("ascii").split("\n")
        verts = np.array([[float(v) for v in text[i].split()[:3]]
                          for i in range(n_vert)], np.float32)
        faces = np.array([[int(v) for v in text[n_vert + i].split()[1:4]]
                          for i in range(n_face)], np.int32)
        return verts, faces

    dtype = np.dtype([(name, type_map[t]) for name, t in vert_props])
    vert_data = np.frombuffer(body, dtype=dtype, count=n_vert)
    verts = np.stack([vert_data["x"], vert_data["y"], vert_data["z"]],
                     axis=-1).astype(np.float32)
    offset = dtype.itemsize * n_vert
    face_dtype = np.dtype([("n", "u1"), ("idx", "<i4", 3)])
    face_data = np.frombuffer(body, dtype=face_dtype, count=n_face,
                              offset=offset)
    return verts, face_data["idx"].astype(np.int32)


def apply_transform(vertices: np.ndarray, mat4: np.ndarray) -> np.ndarray:
    """Apply a 4x4 homogeneous transform (trimesh.apply_transform
    equivalent, runner.py:232)."""
    homo = np.concatenate(
        [vertices, np.ones_like(vertices[:, :1])], axis=-1)
    out = homo @ mat4.T
    return out[:, :3] / out[:, 3:4]
