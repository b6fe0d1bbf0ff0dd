"""Native (C++) host-runtime components.

The TPU compute path is native via Mosaic/XLA codegen (``ops/pallas``);
this package is the native HOST path — the counterpart of the reference's
C++ DataLoader core + FileClient/lmdb IO (torch DataLoader worker
processes, /root/reference/main.py:164-239): a GIL-free worker pool that
preads packed records, decodes PNG/JPEG with libpng/libjpeg, and writes
cropped/flipped float32 frames into caller-owned numpy buffers.

Built lazily with g++ on first use and cached next to the source; every
consumer falls back to the pure-Python path when the toolchain or codec
libraries are missing (``native_available()``).
"""
from __future__ import annotations

import hashlib
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "src", "clip_loader.cpp")
_LIB = os.path.join(_DIR, "_mgld_native.so")
_STAMP = os.path.join(_DIR, "_mgld_native.sha")

_build_error: str | None = None


def _src_sha() -> str:
    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def build_native(force: bool = False) -> str:
    """Compile the shared library if needed; returns its path.

    Raises RuntimeError (with the compiler output) on failure.
    """
    sha = _src_sha()
    if not force and os.path.exists(_LIB) and os.path.exists(_STAMP):
        with open(_STAMP) as f:
            if f.read().strip() == sha:
                return _LIB
    # build into a per-process temp name, then rename atomically: N
    # concurrent processes (one per chip, --num-shards protocol) may race
    # here, and dlopen of a half-written .so segfaults
    tmp_lib = f"{_LIB}.{os.getpid()}.tmp"
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC,
        "-o", tmp_lib, "-ljpeg", "-lpng", "-lz", "-lpthread",
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        try:
            os.unlink(tmp_lib)
        except OSError:
            pass
        raise RuntimeError(
            f"native build failed ({' '.join(cmd)}):\n{proc.stderr}")
    tmp_stamp = f"{_STAMP}.{os.getpid()}.tmp"
    with open(tmp_stamp, "w") as f:
        f.write(sha)
    os.rename(tmp_lib, _LIB)
    os.rename(tmp_stamp, _STAMP)
    return _LIB


def native_available() -> bool:
    """True if the native library is present or can be built here."""
    global _build_error
    if _build_error is not None:
        return False
    try:
        build_native()
        return True
    except Exception as e:  # toolchain or codec headers missing
        _build_error = str(e)
        return False
