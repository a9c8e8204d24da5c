"""ctypes bindings for the C++ runtime library (native/ccm_native.cpp).

Builds the shared object on first use (g++ + libpng are part of the image).
Provides:
  * NativeImageLoader — threaded prefetching grayscale PNG stream (the
    camera data path; decodes ahead of the tracker).
  * NativeChannel / serve_one — framed TCP transport for MapMsg pytrees
    between host processes (the ROS-topic replacement; reliability semantics
    live in runtime/communicator.py above it).
"""

from __future__ import annotations

import ctypes
import io
import os
import pickle
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libccm_native.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.join(_NATIVE_DIR, "ccm_native.cpp")
    if not os.path.exists(_SO_PATH) or os.path.getmtime(_SO_PATH) < os.path.getmtime(src):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
    lib = ctypes.CDLL(_SO_PATH)
    lib.ccm_loader_create.restype = ctypes.c_void_p
    lib.ccm_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int, ctypes.c_int,
    ]
    lib.ccm_loader_next.restype = ctypes.c_int
    lib.ccm_loader_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int, ctypes.c_int,
    ]
    lib.ccm_loader_destroy.argtypes = [ctypes.c_void_p]
    lib.ccm_tcp_listen.restype = ctypes.c_int
    lib.ccm_tcp_accept.restype = ctypes.c_int
    lib.ccm_tcp_connect.restype = ctypes.c_int
    lib.ccm_tcp_connect.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.ccm_tcp_send_msg.restype = ctypes.c_int
    lib.ccm_tcp_send_msg.argtypes = [
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
    ]
    lib.ccm_tcp_recv_msg.restype = ctypes.c_int64
    lib.ccm_tcp_recv_msg.argtypes = [
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
    ]
    _lib = lib
    return lib


class NativeImageLoader:
    """Prefetching grayscale PNG stream: `for img in loader:` yields float32
    [H, W] arrays in path order while worker threads decode ahead."""

    def __init__(self, paths, n_threads: int = 4, queue_depth: int = 8,
                 max_h: int = 1024, max_w: int = 2048):
        lib = _load()
        self._paths = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        self._h = lib.ccm_loader_create(arr, len(self._paths), n_threads, queue_depth)
        self._lib = lib
        self._buf = np.zeros((max_h, max_w), np.uint8)
        self._max = (max_h, max_w)

    def __iter__(self):
        return self

    def __next__(self):
        oh, ow = ctypes.c_int(), ctypes.c_int()
        r = self._lib.ccm_loader_next(
            self._h,
            self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.byref(oh), ctypes.byref(ow), self._max[0], self._max[1],
        )
        if r == 0:
            raise StopIteration
        if r < 0:
            raise IOError("native PNG decode failed")
        return self._buf[: oh.value, : ow.value].astype(np.float32)

    def close(self):
        if self._h:
            self._lib.ccm_loader_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def _to_bytes(obj) -> bytes:
    """Pytree -> bytes: numpy-ify jax leaves, pickle the container.
    ``bytes`` leaves pass through untouched (pre-packed wire payloads —
    runtime/wire.py quantized MapMsg buffers ride inside the envelope)."""
    import jax

    np_tree = jax.tree.map(
        lambda x: x if isinstance(x, bytes) else np.asarray(x), obj
    )
    return pickle.dumps(np_tree, protocol=pickle.HIGHEST_PROTOCOL)


def _from_bytes(data: bytes):
    return pickle.loads(data)


class NativeChannel:
    """One framed-TCP connection carrying pytree messages."""

    MAX_MSG = 256 * 1024 * 1024

    def __init__(self, fd: int):
        self._lib = _load()
        self._fd = fd
        self._buf = np.zeros(self.MAX_MSG, np.uint8)

    @classmethod
    def connect(cls, host: str, port: int) -> "NativeChannel":
        lib = _load()
        fd = lib.ccm_tcp_connect(host.encode(), port)
        if fd < 0:
            raise ConnectionError(f"connect {host}:{port} failed")
        return cls(fd)

    @classmethod
    def listener(cls, port: int) -> int:
        lib = _load()
        fd = lib.ccm_tcp_listen(port)
        if fd < 0:
            raise OSError(f"listen on {port} failed")
        return fd

    @classmethod
    def accept(cls, listen_fd: int) -> "NativeChannel":
        lib = _load()
        fd = lib.ccm_tcp_accept(listen_fd)
        if fd < 0:
            raise OSError("accept failed")
        return cls(fd)

    def send(self, obj) -> None:
        data = np.frombuffer(_to_bytes(obj), np.uint8)
        r = self._lib.ccm_tcp_send_msg(
            self._fd, data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data)
        )
        if r != 0:
            raise ConnectionError("send failed")

    def recv(self):
        n = self._lib.ccm_tcp_recv_msg(
            self._fd, self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            self.MAX_MSG,
        )
        if n == -1:
            raise ConnectionError("recv failed / closed")
        if n == -2:
            raise ValueError("message exceeded MAX_MSG")
        return _from_bytes(self._buf[:n].tobytes())

    def close(self):
        self._lib.ccm_tcp_close(self._fd)
