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


def make_square_batch(num: int, dim: int, rng: np.random.Generator,
                      kappa_cap: float | None = None) -> np.ndarray:
    """Random GENERAL (nonsymmetric, sign-mixed) square batch — the
    pivoting-path fixture class (ref ``tests/square_5_*.mats``).

    Differs deliberately from the reference's construction: its
    uniform(0,1) squares carry a dominant all-positive rank-1 mean
    component that drives κ to ~4e4 at n=128 — where even LAPACK fp32
    fails the 1e-4 gate, so the error column stops measuring the
    algorithm.  Zero-mean Gaussian entries remove that component (median
    κ ≈ 3-4·n) and mixed signs exercise real partial pivoting (the
    diagonally-dominant SPD family never swaps a row).  Draws are
    rejected until κ ≤ ``kappa_cap`` (default 4·dim) so the gate stays a
    statement about the kernel, not the draw.
    """
    cap = 4.0 * dim if kappa_cap is None else kappa_cap
    out = np.empty((num, dim, dim))
    got = 0
    while got < num:
        # draw only the deficit (padded ~30% for the rejection rate) —
        # each candidate costs an SVD-based cond() on the host, so
        # redrawing `num` per top-up round is pure waste (code-review r3)
        draw = min(num, max(4, int(1.3 * (num - got)) + 1))
        cand = rng.standard_normal((draw, dim, dim))
        ok = cand[np.linalg.cond(cand) <= cap]
        take = min(num - got, ok.shape[0])
        out[got:got + take] = ok[:take]
        got += take
    return out


def generate_square_fixtures(path: str, dim: int, num: int = 5, seed: int = 0) -> None:
    """``a.mats`` + ``aInv.mats`` for the general-square family
    (ref ``tests/square_5_{8..128}_*.mats`` — 5 matrices per dim; the
    reference ships no ground-truth inverse for them, we do)."""
    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(seed + 500 + dim)
    a = make_square_batch(num, dim, rng)
    write_mats(os.path.join(path, "a.mats"), a)
    write_mats(os.path.join(path, "aInv.mats"), np.linalg.inv(a))


def singular_demo_batch() -> np.ndarray:
    """Hand-written singular 3×3 batch for the failure-path demos (the
    capability of the reference's ``src/gauss/31.txt`` family — singular
    stdin cases for the early prototypes; SURVEY §2.2).  Matrix 0 is
    regular, matrix 1 is rank-2 (row2 = row0 + row1), matrix 2 has a zero
    column — so per-matrix singularity REPORTING (not just detection) is
    exercised."""
    regular = np.array([[4.0, 1.0, 0.0],
                        [1.0, 5.0, 2.0],
                        [0.0, 2.0, 6.0]])
    rank2 = np.array([[1.0, 2.0, 3.0],
                      [4.0, 5.0, 6.0],
                      [5.0, 7.0, 9.0]])  # row2 = row0 + row1
    zerocol = np.array([[1.0, 0.0, 2.0],
                        [3.0, 0.0, 4.0],
                        [5.0, 0.0, 6.0]])
    return np.stack([regular, rank2, zerocol])


def generate_singular_fixtures(path: str) -> None:
    """The singular/edge-case demo files (ref ``src/gauss/{31,...}.txt``):
    one batch ``.mats`` plus single-matrix stdin-format ``.txt`` files in
    the prototypes' ``n`` + n² values format."""
    os.makedirs(path, exist_ok=True)
    batch = singular_demo_batch()
    write_mats(os.path.join(path, "singular_batch.mats"), batch)
    for name, m in (("regular_3x3", batch[0]), ("singular_rank2_3x3", batch[1]),
                    ("singular_zerocol_3x3", batch[2])):
        with open(os.path.join(path, f"{name}.txt"), "w") as f:
            f.write(f"{m.shape[0]}\n")
            for row in m:
                f.write("\t".join(f"{v:.1f}" for v in row) + "\n")


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
        # general-square pivoting family (ref square_5_*: 5 per dim)
        generate_square_fixtures(os.path.join(root, f"square_5_{dim}x{dim}"), dim, 5, seed)
    generate_singular_fixtures(os.path.join(root, "singular"))
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
