"""Build + load helpers for the C++ components (g++ -> .so, ctypes ABI)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))

SOURCES = {
    "marching": "marching_tet.cc",
    "rasterize": "rasterize.cc",
    "crc32c": "crc32c.cc",
}


def lib_path(name: str) -> str:
    return os.path.join(_DIR, f"lib{name}.so")


def build(name: str, verbose: bool = False) -> str:
    src = os.path.join(_DIR, SOURCES[name])
    out = lib_path(name)
    # compile to a process-unique tmp then os.rename (atomic on POSIX):
    # concurrent first-use builds (2-process jax.distributed runs, parallel
    # test workers) would otherwise link into the SAME path and a sibling
    # could CDLL a half-written ELF
    tmp = f"{out}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", src, "-o", tmp]
    if verbose:
        print(" ".join(cmd))
    try:
        subprocess.run(cmd, check=True)
        os.replace(tmp, out)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    return out


def load_library(name: str, auto_build: bool = True) -> Optional[ctypes.CDLL]:
    """Load lib{name}.so, building it on first use; None if unbuildable."""
    path = lib_path(name)
    src = os.path.join(_DIR, SOURCES[name])
    try:
        if not os.path.exists(path) or (
            os.path.exists(src) and os.path.getmtime(src) > os.path.getmtime(path)
        ):
            if not auto_build:
                return None
            build(name)
        return ctypes.CDLL(path)
    except (OSError, subprocess.CalledProcessError) as e:
        print(f"NOTE: native backend {name!r} unavailable ({e}); using fallback")
        return None


def main():
    for name in SOURCES:
        print("built", build(name, verbose=True))


if __name__ == "__main__":
    main()
