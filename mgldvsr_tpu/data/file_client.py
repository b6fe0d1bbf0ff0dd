"""File IO backends for datasets.

Capability parity with basicsr ``FileClient``
(/root/reference/basicsr/utils/file_client.py:132-167: disk / lmdb /
memcached) and ``LmdbMaker`` (lmdb_util.py:159). The lmdb and memcached
backends are gated on their client packages (not in this image); lmdb's role — one big file with
O(1) keyed reads instead of millions of small files — is covered by a
self-contained **packed-record** backend (single data file + JSON index),
which suits sequential TPU host feeding at least as well.
"""
from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np


class DiskBackend:
    def get(self, filepath: str) -> bytes:
        with open(filepath, "rb") as f:
            return f.read()


class LmdbBackend:
    def __init__(self, db_path: str, readonly: bool = True, lock: bool = False):
        try:
            import lmdb
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "lmdb backend requested but the lmdb package is not "
                "installed; use 'disk' or 'packed'"
            ) from e
        self._env = lmdb.open(db_path, readonly=readonly, lock=lock,
                              readahead=False)

    def get(self, key: str) -> bytes:
        with self._env.begin(write=False) as txn:
            return bytes(txn.get(key.encode("ascii")))


class MemcachedBackend:
    """Memcached keyed reads (file_client.py:22-55 in the reference's
    basicsr/utils — the ``mc`` petrel-style client). Import-gated: the
    proprietary ``mc`` package is tried first (exact reference semantics),
    falling back to the open ``pylibmc`` client; either way ``get``
    returns the raw value bytes for a path key and raises ``KeyError``
    on a miss (the disk/packed/lmdb backend contract)."""

    def __init__(self, server_list_cfg: str = "", client_cfg: str = "",
                 sys_path: Optional[str] = None, client=None):
        if client is not None:  # injected (tests / custom pools)
            self._get = client.get
            return
        if sys_path is not None:
            import sys

            sys.path.append(sys_path)
        try:
            import mc

            self._client = mc.MemcachedClient.GetInstance(
                server_list_cfg, client_cfg)
            self._buf = mc.pyvector()

            def _get(key: str) -> bytes:
                self._client.Get(key, self._buf)
                return mc.ConvertBuffer(self._buf)

            self._get = _get
            return
        except ImportError:
            pass
        try:
            import pylibmc

            _mc_get = pylibmc.Client(
                [s for s in server_list_cfg.split(",") if s]).get

            def _get(key: str) -> bytes:
                # pylibmc returns None for missing keys and may transparently
                # deserialize non-bytes values; normalize to the disk/packed/
                # lmdb backend contract (raise on miss, bytes only).
                val = _mc_get(key)
                if val is None:
                    raise KeyError(key)
                if not isinstance(val, bytes):
                    raise TypeError(
                        f"memcached value for {key!r} is {type(val).__name__},"
                        " expected raw bytes")
                return val

            self._get = _get
        except ImportError as e:
            raise ImportError(
                "memcached backend requested but neither 'mc' nor "
                "'pylibmc' is installed; use 'disk', 'packed' or 'lmdb'"
            ) from e

    def get(self, key: str) -> bytes:
        return self._get(str(key))


class PackedBackend:
    """Keyed reads from a packed record file (``<root>.data`` +
    ``<root>.index.json`` mapping key -> [offset, length])."""

    def __init__(self, root: str):
        import os

        with open(root + ".index.json") as f:
            self._index: Dict[str, list] = json.load(f)
        # raw fd + positioned reads: pread is atomic per call, so the
        # prefetch threads can read concurrently with no seek races and no
        # lock (a shared file object's seek+read interleaves across
        # threads and returns corrupt records)
        self._fd = os.open(root + ".data", os.O_RDONLY)

    def get(self, key: str) -> bytes:
        import os

        off, length = self._index[key]
        return os.pread(self._fd, length, off)

    def keys(self):
        return self._index.keys()

    def close(self):
        import os

        os.close(self._fd)


class PackedMaker:
    """Build a packed record file (the LmdbMaker counterpart)."""

    def __init__(self, root: str):
        self._root = root
        self._file = open(root + ".data", "wb")
        self._index: Dict[str, list] = {}
        self._off = 0

    def put(self, key: str, data: bytes):
        self._file.write(data)
        self._index[key] = [self._off, len(data)]
        self._off += len(data)

    def close(self):
        self._file.close()
        with open(self._root + ".index.json", "w") as f:
            json.dump(self._index, f)


class FileClient:
    """Backend dispatch: 'disk' (default), 'packed', 'lmdb', 'memcached'."""

    def __init__(self, backend: str = "disk", **kwargs):
        if backend == "disk":
            self._b = DiskBackend()
        elif backend == "packed":
            self._b = PackedBackend(**kwargs)
        elif backend == "lmdb":
            self._b = LmdbBackend(**kwargs)
        elif backend == "memcached":
            self._b = MemcachedBackend(**kwargs)
        else:
            raise ValueError(f"unknown io backend {backend!r}")
        self.backend = backend

    def get(self, key: str) -> bytes:
        return self._b.get(key)


def imfrombytes(content: bytes, flag: str = "color",
                float32: bool = False) -> np.ndarray:
    """Decode an image buffer (cv2 semantics: BGR HWC)."""
    import cv2

    flags = {
        "color": cv2.IMREAD_COLOR,
        "grayscale": cv2.IMREAD_GRAYSCALE,
        "unchanged": cv2.IMREAD_UNCHANGED,
    }[flag]
    img = cv2.imdecode(np.frombuffer(content, np.uint8), flags)
    if float32:
        img = img.astype(np.float32) / 255.0
    return img
