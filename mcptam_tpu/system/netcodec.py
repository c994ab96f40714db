"""Array-payload codec for the distributed map protocol.

The reference serializes map objects to ROS messages with string-id
dictionaries and JPEG-compressed keyframe images
(src/NetworkManager.cc:741-805, include/mcptam/Dictionary.h).  Here a
message is a named set of numpy arrays packed into one zlib-compressed
binary blob (keyframe imagery rides as uint8 atlases inside the same
scheme); slot indices are globally consistent by construction, so no id
translation dictionaries are needed."""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ModifyMap action vocabulary (reference srv/ModifyMap.srv)
ACTION_ADD = 1
ACTION_DELETE = 2
ACTION_UPDATE = 3
ACTION_OUTLIERS = 4
ACTION_INIT = 5
ACTION_RESET = 6
ACTION_STATE = 7

_DTYPES = [
    np.dtype(np.uint8), np.dtype(np.int32), np.dtype(np.int64),
    np.dtype(np.float32), np.dtype(np.float64), np.dtype(np.bool_),
    np.dtype(np.uint32),
]
_DTYPE_CODE = {dt: i for i, dt in enumerate(_DTYPES)}


def pack_arrays(arrays: dict, compress: bool = True) -> bytes:
    parts = [struct.pack("<I", len(arrays))]
    for key, arr in arrays.items():
        arr = np.ascontiguousarray(arr)
        if arr.dtype not in _DTYPE_CODE:
            arr = arr.astype(np.float32)
        kb = key.encode()
        parts.append(struct.pack("<H", len(kb)))
        parts.append(kb)
        parts.append(
            struct.pack("<BB", _DTYPE_CODE[arr.dtype], arr.ndim)
        )
        parts.append(struct.pack(f"<{arr.ndim}Q", *arr.shape))
        parts.append(arr.tobytes())
    raw = b"".join(parts)
    if compress:
        return b"Z" + zlib.compress(raw, 3)
    return b"R" + raw


def unpack_arrays(blob: bytes) -> dict:
    tag, body = blob[:1], blob[1:]
    if tag == b"Z":
        body = zlib.decompress(body)
    off = 0
    (n,) = struct.unpack_from("<I", body, off)
    off += 4
    out = {}
    for _ in range(n):
        (klen,) = struct.unpack_from("<H", body, off)
        off += 2
        key = body[off : off + klen].decode()
        off += klen
        code, ndim = struct.unpack_from("<BB", body, off)
        off += 2
        shape = struct.unpack_from(f"<{ndim}Q", body, off)
        off += 8 * ndim
        dt = _DTYPES[code]
        count = int(np.prod(shape)) if ndim else 1
        nbytes = count * dt.itemsize
        arr = np.frombuffer(body, dt, count, off).reshape(shape)
        off += nbytes
        out[key] = arr.copy()
    return out
