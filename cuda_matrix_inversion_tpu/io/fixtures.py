"""Deterministic NumPy fixture generator — replaces the MATLAB scripts.

Reference counterparts: ``tests/generate_inverse_matrices.m`` and
``tests/generate_gaussian_matrices.m``.  Same construction: entries are
uniform(0,1); SPD matrices are built as ``B = R + Rᵀ + dim·I`` (symmetric
diagonally dominant ⇒ SPD); GP ground truth is the closed form
``mean = aᵀ (B+diag c)⁻¹ d``, ``var = e − aᵀ (B+diag c)⁻¹ a``
(``generate_gaussian_matrices.m:36-37``).  Ground truth here is computed in
float64 (the MATLAB scripts also ran in double).

Also regenerates the fixture sets the reference ships incomplete
(SURVEY §2.2): ``inverse_100_64x64/aInv.mats``, a 128×128 inverse set,
``gaussian_100_128x128/b.mats``, and the ``spd_100_64_64.mats`` batch named
in BASELINE.json.
"""

from __future__ import annotations

import os

import numpy as np

from cuda_matrix_inversion_tpu.io.mats import write_mats


def make_spd_batch(num: int, dim: int, rng: np.random.Generator) -> np.ndarray:
    """Random symmetric diagonally-dominant SPD batch
    (ref ``generate_inverse_matrices.m:8-18``)."""
    r = rng.random((num, dim, dim))
    return r + np.transpose(r, (0, 2, 1)) + dim * np.eye(dim)


def generate_inverse_fixtures(path: str, dim: int, num: int = 100, seed: int = 0) -> None:
    """``a.mats`` + MATLAB-style ``aInv.mats`` ground truth
    (ref ``generate_inverse_matrices.m``)."""
    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(seed + dim)
    a = make_spd_batch(num, dim, rng)
    write_mats(os.path.join(path, "a.mats"), a)
    write_mats(os.path.join(path, "aInv.mats"), np.linalg.inv(a))


def generate_gaussian_fixtures(path: str, dim: int, num: int = 100, seed: int = 0) -> None:
    """The 7-file GP fixture set (ref ``generate_gaussian_matrices.m``)."""
    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(seed + 1000 + dim)
    a = rng.random((num, dim, 1))
    b = make_spd_batch(num, dim, rng)
    c = rng.random((num, dim, 1))
    d = rng.random((num, dim, 1))
    e = rng.random((num, 1, 1))

    k = b + np.eye(dim) * c[:, :, 0][:, None, :]  # B + diag(c)
    k_inv = np.linalg.inv(k)
    means = np.transpose(a, (0, 2, 1)) @ (k_inv @ d)  # (num, 1, 1)
    variances = e - np.transpose(a, (0, 2, 1)) @ (k_inv @ a)

    for name, arr in (
        ("a", a), ("b", b), ("c", c), ("d", d), ("e", e),
        ("means", means), ("variances", variances),
    ):
        write_mats(os.path.join(path, f"{name}.mats"), arr)


def generate_all(root: str, dims=(8, 16, 32, 64, 128), num: int = 100, seed: int = 0) -> None:
    """Full fixture tree, mirroring the reference's ``tests/`` layout plus
    the gaps SURVEY §4 asks to fill."""
    for dim in dims:
        generate_inverse_fixtures(os.path.join(root, f"inverse_{num}_{dim}x{dim}"), dim, num, seed)
        generate_gaussian_fixtures(os.path.join(root, f"gaussian_{num}_{dim}x{dim}"), dim, num, seed)
    # BASELINE.json config 2: a standalone SPD batch file.
    rng = np.random.default_rng(seed + 424242)
    write_mats(os.path.join(root, "spd_100_64_64.mats"), make_spd_batch(100, 64, rng))


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description="Generate .mats benchmark fixtures (NumPy port of tests/generate_*.m)")
    p.add_argument("root", help="output directory")
    p.add_argument("--dims", type=int, nargs="+", default=[8, 16, 32, 64, 128])
    p.add_argument("--num", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    generate_all(args.root, tuple(args.dims), args.num, args.seed)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
