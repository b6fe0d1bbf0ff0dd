"""ctypes binding for the native clip loader (``src/clip_loader.cpp``).

``NativeClipLoader`` reads a packed-record file (the ``PackedMaker``
format: ``<root>.data`` + ``<root>.index.json``) and serves decoded,
cropped, normalized float32 BGR-HWC clips from a C++ worker pool —
decode/crop runs outside the GIL and overlaps with device feeding.
"""
from __future__ import annotations

import ctypes
import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from mgldvsr_tpu.native import build_native

_STATUS = {0: "ok", 1: "read error", 2: "decode error",
           3: "crop out of bounds", 4: "bad record id"}

_lib = None


def _load_lib():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build_native())
        lib.mgld_open.restype = ctypes.c_void_p
        lib.mgld_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.mgld_register.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int]
        lib.mgld_probe.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.mgld_submit.restype = ctypes.c_int64
        lib.mgld_submit.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        lib.mgld_fetch.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.mgld_decode_one.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
        lib.mgld_close.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


class NativeClipLoader:
    """Keyed, threaded clip reads from a packed-record image file."""

    def __init__(self, root: str, num_threads: int = 4):
        self._lib = _load_lib()
        with open(root + ".index.json") as f:
            index: Dict[str, list] = json.load(f)
        self._keys: Dict[str, int] = {}
        offs = np.empty(len(index), np.int64)
        lens = np.empty(len(index), np.int64)
        for i, (k, (off, length)) in enumerate(index.items()):
            self._keys[k] = i
            offs[i] = off
            lens[i] = length
        self._h = self._lib.mgld_open(
            (root + ".data").encode(), int(num_threads))
        if not self._h:
            raise FileNotFoundError(root + ".data")
        self._lib.mgld_register(
            self._h, offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(index))
        self._dims: Dict[int, Tuple[int, int]] = {}
        # jobs whose output buffers must stay alive until fetched
        self._pending: Dict[int, np.ndarray] = {}

    def keys(self):
        return self._keys.keys()

    def _rec(self, key: str) -> int:
        try:
            return self._keys[key]
        except KeyError:
            raise KeyError(f"record {key!r} not in packed index") from None

    def probe(self, key: str) -> Tuple[int, int]:
        """(height, width) from the image header — no full decode."""
        rec = self._rec(key)
        if rec not in self._dims:
            h = ctypes.c_int()
            w = ctypes.c_int()
            st = self._lib.mgld_probe(self._h, rec, ctypes.byref(h),
                                      ctypes.byref(w))
            if st != 0:
                raise IOError(f"probe({key}): {_STATUS.get(st, st)}")
            self._dims[rec] = (h.value, w.value)
        return self._dims[rec]

    def decode(self, key: str) -> np.ndarray:
        """Full-frame float32 BGR [0,1] decode of one record."""
        rec = self._rec(key)
        h, w = self.probe(key)
        out = np.empty((h, w, 3), np.float32)
        st = self._lib.mgld_decode_one(
            self._h, rec, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if st != 0:
            raise IOError(f"decode({key}): {_STATUS.get(st, st)}")
        return out

    def submit_clip(
        self,
        keys: Sequence[str],
        top: int,
        left: int,
        crop_h: int,
        crop_w: int,
        hflip: bool = False,
        vflip: bool = False,
        transpose: bool = False,
    ) -> int:
        """Queue an async decode+crop of a frame window; returns a ticket."""
        ids = np.asarray([self._rec(k) for k in keys], np.int32)
        oh, ow = (crop_w, crop_h) if transpose else (crop_h, crop_w)
        out = np.empty((len(keys), oh, ow, 3), np.float32)
        ticket = self._lib.mgld_submit(
            self._h, ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            len(keys), top, left, crop_h, crop_w,
            int(hflip), int(vflip), int(transpose),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        self._pending[int(ticket)] = out
        return int(ticket)

    def fetch(self, ticket: int) -> np.ndarray:
        """Block until `ticket` is done; returns its [t,h,w,3] clip."""
        out = self._pending.pop(ticket)
        st = self._lib.mgld_fetch(self._h, ticket)
        if st != 0:
            raise IOError(f"clip job: {_STATUS.get(st, st)}")
        return out

    def load_clip(self, keys: Sequence[str], top: int, left: int,
                  crop_h: int, crop_w: int, **kw) -> np.ndarray:
        return self.fetch(self.submit_clip(keys, top, left, crop_h, crop_w,
                                           **kw))

    def close(self):
        if self._h:
            self._lib.mgld_close(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


def pack_image_dir(root_dir: str, out_root: str,
                   exts: Tuple[str, ...] = (".png", ".jpg", ".jpeg")) -> int:
    """Pack a clip/frame image tree into a packed-record file whose keys
    are paths relative to ``root_dir`` — one-time prep for the native
    loader (LmdbMaker counterpart). Returns the record count."""
    from mgldvsr_tpu.data.file_client import PackedMaker

    maker = PackedMaker(out_root)
    n = 0
    for dirpath, _dirs, files in sorted(os.walk(root_dir)):
        for name in sorted(files):
            if not name.lower().endswith(exts):
                continue
            path = os.path.join(dirpath, name)
            with open(path, "rb") as f:
                maker.put(os.path.relpath(path, root_dir), f.read())
            n += 1
    maker.close()
    return n
