"""Cross-platform shared-library finder and ctypes binder.

Role parity with the reference's DLL loader (dll.py:11-90): locate a
native library by base name across platform conventions and bind typed
functions from it.  Used by the SDL2 screen backend (viz.py) and available
for user extensions.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import os
import sys
from typing import Optional, Sequence


def find_shared_library(
    name: str, extra_paths: Sequence[str] = ()
) -> Optional[str]:
    """Locate `name` (e.g. 'SDL2') as a loadable shared library path.

    Search order: the FIB_LIBRARY_PATH env var, explicit extra paths,
    then the system loader via ctypes.util.find_library.
    """
    if sys.platform.startswith("win"):
        patterns = [f"{name}.dll"]
    elif sys.platform == "darwin":
        patterns = [f"lib{name}.dylib", f"{name}.framework/{name}"]
    else:
        patterns = [f"lib{name}.so", f"lib{name}-2.0.so.0"]

    search_dirs = []
    env = os.environ.get("FIB_LIBRARY_PATH")
    if env:
        search_dirs.extend(env.split(os.pathsep))
    search_dirs.extend(extra_paths)

    for d in search_dirs:
        for p in patterns:
            cand = os.path.join(d, p)
            if os.path.exists(cand):
                return cand

    return ctypes.util.find_library(name)


class SharedLibrary:
    """A lazily-bound ctypes library wrapper."""

    def __init__(self, name: str, extra_paths: Sequence[str] = ()):
        path = find_shared_library(name, extra_paths)
        if path is None:
            raise OSError(f"could not find shared library {name!r}")
        self.path = path
        self.cdll = ctypes.CDLL(path)

    def bind(self, func_name: str, argtypes=None, restype=None):
        """Bind one function with its signature; returns the callable or
        None when the symbol is absent (optional APIs)."""
        fn = getattr(self.cdll, func_name, None)
        if fn is None:
            return None
        if argtypes is not None:
            fn.argtypes = argtypes
        fn.restype = restype
        return fn
