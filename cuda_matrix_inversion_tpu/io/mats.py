"""``.mats`` text fixture format: reader, writer, test-folder loaders.

Format (reference writer ``tests/generate_gaussian_matrices.m:5-12,30-37``,
reader ``src/helper.cu:15-52``): a header line ``numMatrices\\tm\\tn``, then
for each matrix ``m`` lines of ``n`` tab-separated values (one matrix row
per line).  The reference parses into a contiguous *column-major* block
(``src/helper.cu:45``); we parse into a C-contiguous ``(num, m, n)`` ndarray
with rows as rows — the represented matrices are identical.

The reference caps file reads at 64 MB (``include/helper_cpu.h:4``); we keep
the same guard (configurable) to fail fast on malformed headers.

A native C++ fast-path parser lives in ``native/matsio.cpp`` and is used
automatically when built (see ``cuda_matrix_inversion_tpu/native/build.py``);
this module is the always-available fallback and the semantics reference.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from cuda_matrix_inversion_tpu.utils.errors import ensure

MAX_MATS_FILE_BYTES = 512 * 1024 * 1024  # ref 64 MB cap, raised for 10k batches


def _native_reader():
    try:
        from cuda_matrix_inversion_tpu.native import matsio

        return matsio if matsio.available() else None
    except Exception:
        return None


def read_mats(path: str, dtype=None, max_bytes: int = MAX_MATS_FILE_BYTES) -> np.ndarray:
    """Read a ``.mats`` file → ``(num, m, n)`` ndarray (ref ``readMatricesFile``,
    ``src/helper.cu:15-52``)."""
    size = os.path.getsize(path)
    ensure(size <= max_bytes, "%s is %d bytes; cap is %d", path, size, max_bytes)

    native = _native_reader()
    if native is not None:
        arr = native.read_mats(path)
    else:
        with open(path, "rb") as f:
            text = f.read()
        header_end = text.index(b"\n")
        header = text[:header_end].split()
        ensure(len(header) == 3, "%s: bad .mats header %r", path, text[:header_end])
        num, m, n = (int(tok) for tok in header)
        body = np.array(text[header_end + 1 :].split(), dtype=np.float64)
        ensure(
            body.size == num * m * n,
            "%s: expected %d values (%d×%d×%d), found %d",
            path, num * m * n, num, m, n, body.size,
        )
        arr = body.reshape(num, m, n)

    if dtype is None:
        from cuda_matrix_inversion_tpu.types import default_dtype

        dtype = default_dtype()
    return np.ascontiguousarray(arr.astype(dtype))


def write_mats(path: str, matrices: np.ndarray, precision: int = 17) -> None:
    """Write a ``(num, m, n)`` batch in ``.mats`` format (ref MATLAB
    ``dlmwrite`` calls in ``tests/generate_*.m``)."""
    arr = np.asarray(matrices)
    if arr.ndim == 2:
        arr = arr[None]
    ensure(arr.ndim == 3, "write_mats wants (num, m, n); got %r", arr.shape)
    num, m, n = arr.shape
    fmt = f"%.{precision}g"
    with open(path, "w") as f:
        f.write(f"{num}\t{m}\t{n}\n")
        flat = arr.reshape(num * m, n)
        np.savetxt(f, flat, fmt=fmt, delimiter="\t")


def read_test_folder(folder: str, kind: str = "auto", dtype=None) -> Dict[str, np.ndarray]:
    """Load a fixture directory with cross-file shape validation.

    ``kind='inverse'`` → ``{a, aInv}`` (ref ``readTest``,
    ``src/inverse_bench.c:240-274``); ``kind='gaussian'`` → the 7 GP files
    (ref ``readTest``, ``src/gauss_bench.cu:411-467``).  ``'auto'`` sniffs
    which files exist.
    """
    if kind == "auto":
        kind = "gaussian" if os.path.exists(os.path.join(folder, "b.mats")) else "inverse"

    if kind == "inverse":
        a = read_mats(os.path.join(folder, "a.mats"), dtype)
        out = {"a": a}
        inv_path = os.path.join(folder, "aInv.mats")
        if os.path.exists(inv_path):
            a_inv = read_mats(inv_path, dtype)
            ensure(a.shape == a_inv.shape, "a/aInv shape mismatch: %r vs %r", a.shape, a_inv.shape)
            out["aInv"] = a_inv
        ensure(a.shape[1] == a.shape[2], "inverse fixtures must be square; got %r", a.shape)
        return out

    if kind == "gaussian":
        names = ("a", "b", "c", "d", "e", "means", "variances")
        out = {nm: read_mats(os.path.join(folder, f"{nm}.mats"), dtype) for nm in names}
        num, n, _ = out["b"].shape
        ensure(out["b"].shape == (num, n, n), "b must be square: %r", out["b"].shape)
        for nm in ("a", "c", "d"):
            ensure(
                out[nm].shape == (num, n, 1),
                "%s must be (num, n, 1)=(%d,%d,1); got %r", nm, num, n, out[nm].shape,
            )
        for nm in ("e", "means", "variances"):
            ensure(
                out[nm].shape == (num, 1, 1),
                "%s must be (num,1,1); got %r", nm, out[nm].shape,
            )
        return out

    raise ValueError(f"unknown fixture kind {kind!r}")
