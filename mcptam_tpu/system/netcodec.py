"""Array-payload codec for the distributed map protocol.

The reference serializes map objects to ROS messages with string-id
dictionaries and JPEG-compressed keyframe images
(src/NetworkManager.cc:741-805, include/mcptam/Dictionary.h).  Here a
message is a named set of numpy arrays packed into one zlib-compressed
binary blob; slot indices are globally consistent by construction, so no
id translation dictionaries are needed.  Keyframe imagery (the pyramid
atlas) can ride as per-camera JPEG planes at the reference's quality 90
(src/NetworkManager.cc:804-805) — lossy, like the reference, which
re-derives server-side features from the decoded image."""

from __future__ import annotations

import io
import struct
import zlib

import numpy as np

try:
    from PIL import Image as _PILImage
except Exception:  # pragma: no cover - PIL is in the image, but stay soft
    _PILImage = None

JPEG_QUALITY = 90  # reference NetworkManager JPEG quality (:804-805)

# ModifyMap action vocabulary (reference srv/ModifyMap.srv)
ACTION_ADD = 1
ACTION_DELETE = 2
ACTION_UPDATE = 3
ACTION_OUTLIERS = 4
ACTION_INIT = 5
ACTION_RESET = 6
ACTION_STATE = 7
# client -> server operator-monitoring relay (tracker state + small image;
# the reference server subscribes to the client's system_info/small_image
# topics for the off-board operator, src/SystemServer.cc:113-136)
ACTION_MONITOR = 8

_DTYPES = [
    np.dtype(np.uint8), np.dtype(np.int32), np.dtype(np.int64),
    np.dtype(np.float32), np.dtype(np.float64), np.dtype(np.bool_),
    np.dtype(np.uint32),
]
_DTYPE_CODE = {dt: i for i, dt in enumerate(_DTYPES)}

_FLAG_JPEG = 0x80  # high bit of the dtype-code byte: payload is JPEG planes


def _jpeg_encode_planes(arr: np.ndarray, quality: int) -> bytes:
    planes = arr.reshape((-1,) + arr.shape[-2:])
    blobs = []
    for p in planes:
        buf = io.BytesIO()
        _PILImage.fromarray(p, mode="L").save(
            buf, "JPEG", quality=int(quality)
        )
        blobs.append(buf.getvalue())
    return struct.pack("<I", len(blobs)) + b"".join(
        struct.pack("<I", len(b)) + b for b in blobs
    )


def _jpeg_decode_planes(body: bytes, off: int, shape) -> tuple:
    (n,) = struct.unpack_from("<I", body, off)
    off += 4
    planes = []
    for _ in range(n):
        (ln,) = struct.unpack_from("<I", body, off)
        off += 4
        img = _PILImage.open(io.BytesIO(body[off : off + ln]))
        planes.append(np.asarray(img, np.uint8))
        off += ln
    return np.stack(planes).reshape(shape), off


def pack_arrays(arrays: dict, compress: bool = True,
                jpeg_keys=(), jpeg_quality: int = JPEG_QUALITY) -> bytes:
    parts = [struct.pack("<I", len(arrays))]
    for key, arr in arrays.items():
        arr = np.ascontiguousarray(arr)
        if arr.dtype not in _DTYPE_CODE:
            arr = arr.astype(np.float32)
        kb = key.encode()
        parts.append(struct.pack("<H", len(kb)))
        parts.append(kb)
        as_jpeg = (
            key in jpeg_keys and jpeg_quality > 0 and _PILImage is not None
            and arr.dtype == np.uint8 and arr.ndim >= 2
            and arr.shape[-2] > 0 and arr.shape[-1] > 0
        )
        parts.append(struct.pack(
            "<BB", _DTYPE_CODE[arr.dtype] | (_FLAG_JPEG if as_jpeg else 0),
            arr.ndim,
        ))
        parts.append(struct.pack(f"<{arr.ndim}Q", *arr.shape))
        parts.append(
            _jpeg_encode_planes(arr, jpeg_quality) if as_jpeg
            else arr.tobytes()
        )
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
        if code & _FLAG_JPEG:
            out[key], off = _jpeg_decode_planes(body, off, shape)
            continue
        dt = _DTYPES[code]
        count = int(np.prod(shape)) if ndim else 1
        nbytes = count * dt.itemsize
        arr = np.frombuffer(body, dt, count, off).reshape(shape)
        off += nbytes
        out[key] = arr.copy()
    return out
