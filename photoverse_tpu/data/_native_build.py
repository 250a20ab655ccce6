"""Shared build-on-first-use helper for the native C++ components.

Both native libraries (dataloader, tokenizer) compile from `native/` into
`native/build/` with an mtime staleness check; keeping the g++ invocation
in one place keeps compiler flags and error handling in sync.
"""

from __future__ import annotations

import os
import subprocess
from typing import Sequence

__all__ = ["NativeBuildError", "build_native_lib", "NATIVE_DIR", "BUILD_DIR"]

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
BUILD_DIR = os.path.join(NATIVE_DIR, "build")


class NativeBuildError(RuntimeError):
    pass


def build_native_lib(
    src_name: str, so_name: str, extra_flags: Sequence[str] = ()
) -> str:
    """Compile native/<src_name> to native/build/<so_name> if stale; returns
    the .so path. Raises NativeBuildError with the compiler output on
    failure (callers fall back to their Python implementations)."""
    src = os.path.join(NATIVE_DIR, src_name)
    so = os.path.join(BUILD_DIR, so_name)
    os.makedirs(BUILD_DIR, exist_ok=True)
    if not os.path.exists(src):
        # deployed without the native/ source tree: a prebuilt .so is fine
        # as-is; neither present must surface as NativeBuildError so callers
        # convert it to their Unavailable exception and fall back
        if os.path.exists(so):
            return so
        raise NativeBuildError(f"native source {src} not found")
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    # compile to a process-unique name and rename into place: concurrent
    # builders (multi-host workers, pytest-xdist) must never dlopen a
    # half-written library
    tmp_so = f"{so}.{os.getpid()}.tmp"
    cmd = [
        "g++", "-O3", "-march=native", "-funroll-loops",
        "-shared", "-fPIC", "-std=c++17", src, "-o", tmp_so,
        *extra_flags, "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        os.replace(tmp_so, so)
    except (subprocess.CalledProcessError, FileNotFoundError, OSError) as e:
        msg = getattr(e, "stderr", str(e))
        if os.path.exists(tmp_so):
            os.unlink(tmp_so)
        raise NativeBuildError(f"native build of {src_name} failed: {msg}") from e
    return so
