"""Sharded batched ops: inversion and the GP pipeline over a chip mesh.

New capability vs the single-GPU reference (SURVEY §2.3 row
"multi-chip scale-out").  Two dispatch strategies:

* **GSPMD** (``NamedSharding`` annotation + jit): XLA partitions the
  program.  Correct for plain-XLA algorithms (LU/Cholesky expanders,
  jnp Newton-Schulz) — the math has no cross-matrix dependence, so the
  partitioner splits the batch communication-free.
* **shard_map**: the single-chip function runs verbatim on each chip's
  batch shard.  This is MANDATORY for Pallas-backed algorithms on real
  hardware: ``pallas_call`` lowers to a Mosaic custom call, which the
  GSPMD partitioner cannot split — on a real multi-chip mesh it would
  replicate the whole batch per chip or fail to partition.  (On the CPU
  test mesh the kernels run in interpret mode where they are plain HLO,
  which is why the GSPMD path *appears* to work under the dryrun — see
  VERDICT r1 "What's weak" #1.)

``sharded_inverse`` / ``sharded_gp_mean_variance`` pick the right
strategy automatically from the registry's Pallas marking; the explicit
``*_shard_map`` wrappers remain for forcing per-shard execution.

Batches that don't divide the mesh are padded (identity matrices for
inversion, inert zero-vector problems for GP) and un-sliced after —
shard_map requires the global batch to split evenly.
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from cuda_matrix_inversion_tpu.parallel.mesh import BATCH_AXIS, batch_sharding


def _shard(mesh, x):
    return jax.device_put(x, batch_sharding(mesh, jnp.ndim(x)))


def _pad_batch_to_mesh(mesh, arrays, fills):
    """Pad every array's batch axis with inert entries so it divides the
    mesh (shard_map needs even shards); returns (padded_tuple, orig_size).

    ``fills[i]`` is a callable ``(pad, array) -> pad_block`` choosing the
    inert content per operand (identity matrices, zero/one vectors, ...).
    The single home for the size/remainder edge cases that were once
    copy-pasted per entry point (code-review r3).
    """
    size = int(mesh.devices.size)
    arrays = tuple(jnp.asarray(a) for a in arrays)
    batch = arrays[0].shape[0]
    rem = batch % size
    if rem == 0 and batch > 0:
        return arrays, batch
    pad = size - rem if batch > 0 else size
    return tuple(jnp.concatenate([a, fill(pad, a)], axis=0)
                 for a, fill in zip(arrays, fills)), batch


def _fill_eye(pad, a):
    n = a.shape[-1]
    return jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), (pad, n, n))


def _fill_zeros(pad, a):
    return jnp.zeros((pad,) + a.shape[1:], a.dtype)


def _fill_ones(pad, a):
    return jnp.ones((pad,) + a.shape[1:], a.dtype)


def _pad_to_mesh(mesh, a):
    """Pad the batch axis with identity matrices so it divides the mesh."""
    (padded,), batch = _pad_batch_to_mesh(mesh, (a,), (_fill_eye,))
    return padded, batch


@partial(jax.jit, static_argnames=("algorithm",))
def _inverse_annotated(a, algorithm: str):
    from cuda_matrix_inversion_tpu.ops.registry import get_inverse_algorithm

    return get_inverse_algorithm(algorithm)(a)


@functools.lru_cache(maxsize=64)
def _inverse_shard_mapped(mesh, algorithm: str):
    """One compiled shard_map closure per (mesh, algorithm) — building a
    fresh closure per call would recompile every time (CLAUDE.md gotcha)."""
    from cuda_matrix_inversion_tpu.ops.registry import get_inverse_algorithm

    fn = get_inverse_algorithm(algorithm)
    spec = P(BATCH_AXIS, None, None)
    # check_vma=False: pallas_call outputs carry no varying-mesh-axes
    # annotation, and the per-shard math is batch-local anyway
    return jax.jit(jax.shard_map(fn, mesh=mesh, in_specs=(spec,),
                                 out_specs=spec, check_vma=False))


def sharded_inverse_shard_map(mesh, a, algorithm: str = "lu"):
    """Invert via shard_map: the single-chip kernel runs verbatim on each
    chip's shard (no partitioner in the loop).  Pads the batch to the mesh
    size when needed and slices the result back."""
    padded, batch = _pad_to_mesh(mesh, a)
    out = _inverse_shard_mapped(mesh, algorithm)(_shard(mesh, padded))
    return out if out.shape[0] == batch else out[:batch]


def sharded_inverse(mesh, a, algorithm: str = "lu"):
    """Invert a batch sharded over ``mesh``; returns a sharded device array.

    Input may be host (it will be scattered) or already sharded.  Pallas-
    backed algorithms route through shard_map (GSPMD cannot partition a
    Mosaic custom call on real hardware); plain-XLA algorithms go through
    the partitioner.
    """
    from cuda_matrix_inversion_tpu.ops.registry import is_pallas_algorithm

    if is_pallas_algorithm(algorithm):
        return sharded_inverse_shard_map(mesh, a, algorithm)
    a_sharded = _shard(mesh, a)
    return _inverse_annotated(a_sharded, algorithm)


@functools.lru_cache(maxsize=8)
def _warm_shard_mapped(mesh):
    from cuda_matrix_inversion_tpu.ops.newton_schulz import (
        inverse_newton_schulz_warm,
    )

    spec = P(BATCH_AXIS, None, None)
    return jax.jit(jax.shard_map(inverse_newton_schulz_warm, mesh=mesh,
                                 in_specs=(spec, spec), out_specs=spec,
                                 check_vma=False))


def sharded_inverse_warm(mesh, a, x0):
    """Warm-start Newton-Schulz refinement over the mesh — the serving
    path (refresh a slowly-varying batch from its previous inverse) runs
    per-shard via shard_map like every Pallas kernel.  Both operands are
    padded identically (identity pads refine to identity, staying inert)."""
    padded_a, batch = _pad_to_mesh(mesh, a)
    padded_x0, _ = _pad_to_mesh(mesh, x0)
    out = _warm_shard_mapped(mesh)(_shard(mesh, padded_a),
                                   _shard(mesh, padded_x0))
    return out if out.shape[0] == batch else out[:batch]


# ---- GP pipeline ----

#: gp_mean_variance methods whose device path contains a Pallas kernel.
_PALLAS_GP_METHODS = frozenset({"pallas", "pallas_ns"})


@partial(jax.jit, static_argnames=("method",))
def _gp_annotated(a, b, c, d, e, method: str):
    from cuda_matrix_inversion_tpu.models.gp import gp_mean_variance

    return gp_mean_variance(a, b, c, d, e, method=method)


@functools.lru_cache(maxsize=64)
def _gp_shard_mapped(mesh, method: str):
    from cuda_matrix_inversion_tpu.models.gp import gp_mean_variance

    spec3 = P(BATCH_AXIS, None, None)
    fn = partial(gp_mean_variance, method=method)
    return jax.jit(jax.shard_map(
        fn, mesh=mesh, in_specs=(spec3,) * 5, out_specs=(spec3, spec3),
        check_vma=False,
    ))


def _pad_gp_to_mesh(mesh, a, b, c, d, e):
    """Pad GP operands with inert problems (identity B, zero vectors) so
    the batch divides the mesh."""
    return _pad_batch_to_mesh(
        mesh, (a, b, c, d, e),
        (_fill_zeros, _fill_eye, _fill_zeros, _fill_zeros, _fill_zeros))


def sharded_gp_shard_map(mesh, a, b, c, d, e, method: str = "solve"):
    """GP pipeline via shard_map — per-shard verbatim execution (required
    for the Pallas-fused methods on real hardware)."""
    (a, b, c, d, e), batch = _pad_gp_to_mesh(mesh, a, b, c, d, e)
    args = [_shard(mesh, x) for x in (a, b, c, d, e)]
    mean, var = _gp_shard_mapped(mesh, method)(*args)
    if mean.shape[0] != batch:
        mean, var = mean[:batch], var[:batch]
    return mean, var


def sharded_gp_mean_variance(mesh, a, b, c, d, e, method: str = "solve"):
    """The full GP pipeline with every operand sharded on the batch axis.

    Pallas-fused methods dispatch through shard_map (see module docstring);
    XLA methods go through the GSPMD partitioner.
    """
    if method in _PALLAS_GP_METHODS:
        return sharded_gp_shard_map(mesh, a, b, c, d, e, method=method)
    args = [_shard(mesh, x) for x in (a, b, c, d, e)]
    return _gp_annotated(*args, method=method)


# ---- GP hyper-parameter fit ----

@functools.lru_cache(maxsize=16)
def _fit_shard_mapped(mesh, steps: int, lr: float, method: str):
    from cuda_matrix_inversion_tpu.models.gp_fit import fit_gp_scales

    spec3 = P(BATCH_AXIS, None, None)
    spec1 = P(BATCH_AXIS)

    def run(b, c, d, w):
        # per-shard loss = weighted mean over the LOCAL shard.  Per-system
        # gradients are independent and Adam's m̂/√v̂ normalization
        # cancels the 1/batch scale (up to its eps term), so each
        # system's trajectory matches the global fit.  The global trace
        # is the weight-combined per-shard trace: inert mesh padding
        # (weight 0) drops out entirely — its untrained θ never pollutes
        # lml_path (code-review r3: an unweighted pmean diverged and
        # eventually NaN'd as Adam drove the padded systems' θ to −∞).
        res = fit_gp_scales(b, c, d, steps=steps, lr=lr, method=method,
                            weights=w)
        lw = jnp.sum(w)
        num = jax.lax.psum(res.lml_path * lw, BATCH_AXIS)
        den = jax.lax.psum(lw, BATCH_AXIS)
        return res.log_amp, res.log_noise, res.lml, num / den

    return jax.jit(jax.shard_map(
        run, mesh=mesh, in_specs=(spec3, spec3, spec3, spec1),
        out_specs=(spec1, spec1, spec1, P()), check_vma=False))


def sharded_fit_gp_scales(mesh, b, c, d, steps: int = 150, lr: float = 0.05,
                          method: str = "xla"):
    """Hyper-parameter fit over the mesh (``models/gp_fit.py``).

    ``method='pallas'`` (the fused-LML loop) routes through shard_map —
    its forward/backward are Mosaic custom calls GSPMD cannot split —
    with each shard running the whole Adam scan on its local systems (no
    cross-shard collectives beyond combining the convergence trace).
    XLA methods shard via the partitioner.  Returns a ``GPFitResult``
    with sharded per-system leaves and a replicated global ``lml_path``.
    """
    from cuda_matrix_inversion_tpu.models.gp_fit import (
        GPFitResult,
        fit_gp_scales,
    )

    if method != "pallas":
        args = [_shard(mesh, jnp.asarray(x)) for x in (b, c, d)]
        return fit_gp_scales(*args, steps=steps, lr=lr, method=method)
    # inert fit padding: identity B, unit noise diag, zero observations,
    # weight 0 (frozen θ, excluded from the loss and the trace)
    w = jnp.ones((jnp.asarray(b).shape[0],), jnp.asarray(b).dtype)
    (b, c, d, w), batch = _pad_batch_to_mesh(
        mesh, (b, c, d, w), (_fill_eye, _fill_ones, _fill_zeros,
                             _fill_zeros))
    la, ln, lml, path = _fit_shard_mapped(mesh, steps, lr, method)(
        _shard(mesh, b), _shard(mesh, c), _shard(mesh, d), _shard(mesh, w))
    if la.shape[0] != batch:
        la, ln, lml = la[:batch], ln[:batch], lml[:batch]
    return GPFitResult(log_amp=la, log_noise=ln, lml=lml, lml_path=path)
