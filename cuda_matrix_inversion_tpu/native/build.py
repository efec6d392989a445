"""Build the native components into ``libcmi_native.so``.

Usage: ``python -m cuda_matrix_inversion_tpu.native.build``.
The reference builds its host layer with the Makefile's gcc rules
(``Makefile:130-156``); ours is one ``g++ -O3 -shared`` invocation.
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
LIB = os.path.join(HERE, "libcmi_native.so")
SOURCES = [os.path.join(HERE, "matsio.cpp"), os.path.join(HERE, "oracle.cpp")]


def build(verbose: bool = True) -> str:
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-fPIC", "-shared",
        "-fopenmp",
        "-o", LIB, *SOURCES,
        # Debian ships liblapack.so.3 without the dev symlink
        "-l:liblapack.so.3", "-lgomp",
    ]
    if verbose:
        print("+", " ".join(cmd), file=sys.stderr)
    subprocess.run(cmd, check=True)
    return LIB


def lib_path() -> str | None:
    src_mtime = max(os.path.getmtime(s) for s in SOURCES)
    if os.path.exists(LIB) and os.path.getmtime(LIB) >= src_mtime:
        return LIB
    return None


def ensure_built(quiet: bool = True) -> str | None:
    """Build if stale/missing; never raises (callers fall back to Python)."""
    path = lib_path()
    if path:
        return path
    try:
        return build(verbose=not quiet)
    except Exception:
        return None


if __name__ == "__main__":
    print(build())
