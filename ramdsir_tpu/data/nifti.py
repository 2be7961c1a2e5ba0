"""Minimal standalone NIfTI-1 reader/writer (.nii / .nii.gz).

Replaces the reference's SimpleITK volume I/O
(/root/reference/code/test_prostate_volume.py:87-91): `read_nifti` returns
the array in (z, y, x) order, exactly like sitk.GetArrayFromImage, so the
volume-eval code is drop-in compatible.  Only the NIfTI-1 single-file
layout is supported (that's what the SAML prostate release ships).
"""
from __future__ import annotations

import gzip
import struct
from typing import Tuple

import numpy as np

_DTYPES = {
    2: np.uint8,
    4: np.int16,
    8: np.int32,
    16: np.float32,
    64: np.float64,
    256: np.int8,
    512: np.uint16,
    768: np.uint32,
    1024: np.int64,
    1280: np.uint64,
}
_CODES = {np.dtype(v): k for k, v in _DTYPES.items()}


def _open(path: str, mode: str):
    if path.endswith(".gz"):
        return gzip.open(path, mode)
    return open(path, mode)


def read_nifti(path: str) -> np.ndarray:
    """Read a NIfTI-1 volume; returns (z, y, x[, t...]) like SimpleITK."""
    with _open(path, "rb") as f:
        hdr = f.read(348)
        if len(hdr) < 348:
            raise ValueError(f"{path}: truncated NIfTI header")
        sizeof_hdr = struct.unpack("<i", hdr[0:4])[0]
        swap = "<"
        if sizeof_hdr != 348:
            if struct.unpack(">i", hdr[0:4])[0] == 348:
                swap = ">"
            else:
                raise ValueError(f"{path}: not a NIfTI-1 file")
        dim = struct.unpack(f"{swap}8h", hdr[40:56])
        datatype = struct.unpack(f"{swap}h", hdr[70:72])[0]
        vox_offset = struct.unpack(f"{swap}f", hdr[108:112])[0]
        scl_slope = struct.unpack(f"{swap}f", hdr[112:116])[0]
        scl_inter = struct.unpack(f"{swap}f", hdr[116:120])[0]
        magic = hdr[344:348]
        if magic[:3] not in (b"n+1", b"ni1"):
            raise ValueError(f"{path}: bad NIfTI magic {magic!r}")
        ndim = dim[0]
        shape = tuple(int(d) for d in dim[1 : 1 + ndim])
        if datatype not in _DTYPES:
            raise ValueError(f"{path}: unsupported NIfTI datatype {datatype}")
        dtype = np.dtype(_DTYPES[datatype]).newbyteorder(swap)
        f.seek(int(vox_offset))
        count = int(np.prod(shape))
        data = np.frombuffer(f.read(count * dtype.itemsize), dtype=dtype, count=count)
    # NIfTI stores x-fastest (Fortran); C-reshape to reversed dims == sitk order
    arr = data.reshape(shape[::-1])
    if scl_slope not in (0.0, 1.0) or scl_inter != 0.0:
        slope = scl_slope if scl_slope != 0.0 else 1.0
        arr = arr.astype(np.float32) * slope + scl_inter
    return np.ascontiguousarray(arr)


def write_nifti(path: str, array_zyx: np.ndarray, voxel_size: Tuple[float, ...] = (1.0, 1.0, 1.0)) -> None:
    """Write a (z, y, x) array as a NIfTI-1 single file (n+1)."""
    arr = np.asarray(array_zyx)
    if arr.dtype == np.bool_:
        arr = arr.astype(np.uint8)
    if arr.dtype not in _CODES:
        arr = arr.astype(np.float32)
    code = _CODES[arr.dtype]
    shape_xyz = arr.shape[::-1]
    ndim = len(shape_xyz)
    dim = [ndim] + list(shape_xyz) + [1] * (7 - ndim)
    pixdim = [1.0] + list(voxel_size[:ndim]) + [1.0] * (7 - ndim)

    hdr = bytearray(348)
    struct.pack_into("<i", hdr, 0, 348)
    struct.pack_into("<8h", hdr, 40, *dim)
    struct.pack_into("<h", hdr, 70, code)
    struct.pack_into("<h", hdr, 72, arr.dtype.itemsize * 8)
    struct.pack_into("<8f", hdr, 76, *pixdim)
    struct.pack_into("<f", hdr, 108, 352.0)  # vox_offset
    struct.pack_into("<f", hdr, 112, 1.0)  # scl_slope
    struct.pack_into("<f", hdr, 116, 0.0)  # scl_inter
    hdr[344:348] = b"n+1\x00"

    with _open(path, "wb") as f:
        f.write(bytes(hdr))
        f.write(b"\x00" * 4)  # extension flag
        f.write(arr.tobytes())  # C-order == x-fastest for reversed dims
