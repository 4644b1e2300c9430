"""Shared loader for the repo's g++-built native engines.

One implementation of the build / stale-detection / load-retry protocol
used by both ctypes bindings (`layers/embedding/native.py` for the COO
preprocess engine, `data/native_io.py` for the TFRecord reader), so
fixes to the protocol land in exactly one place. The protocol:

  1. (re)build with g++ when the .so is missing OR older than its
     source (a committed prebuilt binary must never shadow newer code);
  2. if `ctypes.CDLL` fails (foreign ABI / corrupt binary), rebuild
     once from source and retry;
  3. return None — never raise — when no toolchain/source is available
     (callers keep their pure-Python fallbacks).
"""

from __future__ import annotations

import ctypes
import os
import subprocess


def build_shared_lib(source: str, lib_path: str) -> bool:
    """g++ -O3 -shared; False when the toolchain or source is absent."""
    if not os.path.exists(source):
        return False
    try:
        subprocess.run(
            [
                "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                "-o", lib_path, source,
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return False


def _is_stale(source: str, lib_path: str) -> bool:
    """True when the committed .so predates the source it came from."""
    try:
        return os.path.getmtime(source) > os.path.getmtime(lib_path)
    except OSError:
        # Source or lib vanished between exists() and getmtime().
        return False


def load_shared_lib(source: str, lib_path: str) -> ctypes.CDLL | None:
    """Build-if-needed + load; None if the library cannot be provided."""
    if (
        not os.path.exists(lib_path) or _is_stale(source, lib_path)
    ) and not build_shared_lib(source, lib_path):
        if not os.path.exists(lib_path):
            return None
    try:
        return ctypes.CDLL(lib_path)
    except OSError:
        # Foreign-ABI/corrupt binary: rebuild once from source.
        if not build_shared_lib(source, lib_path):
            return None
        try:
            return ctypes.CDLL(lib_path)
        except OSError:
            return None
