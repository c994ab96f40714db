"""Build + load the native runtime libraries (ctypes, no pybind11).

Compiled on first use into mcptam_tpu/native/_build/; callers get ctypes
CDLL handles with argtypes configured."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_BUILD = os.path.join(_DIR, "_build")
_lock = threading.Lock()
_cache = {}

_SOURCES = {
    "framequeue": "framequeue.cc",
    "netmanager": "netmanager.cc",
}


def _compile(name: str) -> str:
    src = os.path.join(_DIR, _SOURCES[name])
    os.makedirs(_BUILD, exist_ok=True)
    out = os.path.join(_BUILD, f"lib{name}.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    cmd = ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-pthread",
           src, "-o", out]
    subprocess.run(cmd, check=True, capture_output=True)
    return out


def load(name: str) -> ctypes.CDLL:
    with _lock:
        if name in _cache:
            return _cache[name]
        lib = ctypes.CDLL(_compile(name))
        if name == "framequeue":
            lib.fq_create.restype = ctypes.c_void_p
            lib.fq_create.argtypes = [
                ctypes.c_int, ctypes.c_uint64, ctypes.c_double, ctypes.c_uint64,
            ]
            lib.fq_destroy.argtypes = [ctypes.c_void_p]
            lib.fq_push.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_double,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.fq_get_synced.restype = ctypes.c_int
            lib.fq_get_synced.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ]
            lib.fq_dropped.restype = ctypes.c_uint64
            lib.fq_dropped.argtypes = [ctypes.c_void_p]
            lib.fq_set_dynamic.argtypes = [ctypes.c_void_p, ctypes.c_int]
            lib.fq_effective_tol.restype = ctypes.c_double
            lib.fq_effective_tol.argtypes = [ctypes.c_void_p]
        elif name == "netmanager":
            lib.nm_create_server.restype = ctypes.c_void_p
            lib.nm_create_server.argtypes = [ctypes.c_uint16]
            lib.nm_create_client.restype = ctypes.c_void_p
            lib.nm_create_client.argtypes = [ctypes.c_char_p, ctypes.c_uint16]
            lib.nm_destroy.argtypes = [ctypes.c_void_p]
            lib.nm_send.argtypes = [
                ctypes.c_void_p, ctypes.c_uint32,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_uint64,
            ]
            lib.nm_poll.restype = ctypes.c_int64
            lib.nm_poll.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint32),
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_uint64, ctypes.c_int,
            ]
            lib.nm_peek_size.restype = ctypes.c_int64
            lib.nm_peek_size.argtypes = [ctypes.c_void_p]
            lib.nm_port.restype = ctypes.c_uint16
            lib.nm_port.argtypes = [ctypes.c_void_p]
            lib.nm_stats.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64),
            ]
            lib.nm_break.argtypes = [ctypes.c_void_p]
        _cache[name] = lib
        return lib
