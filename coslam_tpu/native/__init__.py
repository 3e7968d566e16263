"""Native runtime components (C++), with ctypes bindings.

`transport` — the UDP-multicast message bus replacing the reference's LCM
dependency (SURVEY.md 2.3/5.8).  Built on demand with g++ (no external build
system required); falls back gracefully when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "transport.cpp")
_LIB = os.path.join(_DIR, "libcoslam_transport.so")


def build(force: bool = False) -> str:
    """Compile the native transport library if needed; returns its path."""
    if force or (not os.path.exists(_LIB)
                 or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
             _SRC, "-o", _LIB],
            check=True, capture_output=True)
    return _LIB


_lib: Optional[ctypes.CDLL] = None


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build())
        lib.ct_create.restype = ctypes.c_void_p
        lib.ct_create.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
        lib.ct_publish.restype = ctypes.c_int
        lib.ct_publish.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                   ctypes.c_char_p, ctypes.c_uint64]
        lib.ct_receive.restype = ctypes.c_int64
        lib.ct_receive.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                   ctypes.c_uint64, ctypes.c_char_p,
                                   ctypes.c_uint64, ctypes.c_int,
                                   ctypes.POINTER(ctypes.c_uint64)]
        lib.ct_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


class Transport:
    """UDP-multicast pub/sub endpoint (LCM-channel semantics).

    >>> a = Transport(); b = Transport()
    >>> a.publish("KeyFrameexample", b"payload")
    >>> b.receive(timeout_ms=500)
    ('KeyFrameexample', b'payload')
    """

    def __init__(self, group_ip: str = "239.255.76.67", port: int = 7667,
                 ttl: int = 0):
        lib = _load()
        self._lib = lib
        self._h = lib.ct_create(group_ip.encode(), port, ttl)
        if not self._h:
            raise OSError("failed to create multicast transport "
                          f"({group_ip}:{port})")

    def publish(self, channel: str, data: bytes) -> None:
        rc = self._lib.ct_publish(self._h, channel.encode(), data, len(data))
        if rc != 0:
            raise OSError("publish failed")

    def receive(self, timeout_ms: int = 100,
                max_len: int = 64 * 1024 * 1024
                ) -> Optional[Tuple[str, bytes]]:
        ch = ctypes.create_string_buffer(256)
        buf = ctypes.create_string_buffer(max_len)
        needed = ctypes.c_uint64(0)
        n = self._lib.ct_receive(self._h, ch, 256, buf, max_len, timeout_ms,
                                 ctypes.byref(needed))
        if n == 0:
            return None
        if n < 0:
            raise OSError(f"receive failed (needed {needed.value} bytes)")
        return ch.value.decode(), buf.raw[:n]

    def close(self):
        if getattr(self, "_h", None):
            self._lib.ct_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
