"""Sharded batched ops: inversion and the GP pipeline over a chip mesh.

New capability vs the single-GPU reference (SURVEY §2.3 row
"multi-chip scale-out").  Strategy: annotate the batch axis with
``NamedSharding`` and let XLA partition — each chip inverts its shard of
matrices on ICI-local HBM; there are no cross-matrix collectives in the
math, so SPMD partitioning is communication-free except for the initial
scatter/final gather that ``jax.device_put``/``device_get`` own.

``shard_map`` variants are also provided: they guarantee per-shard
execution of the *exact* single-chip kernel (important once the Pallas
kernels land, since ``pallas_call`` composes with ``shard_map`` directly).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from cuda_matrix_inversion_tpu.parallel.mesh import BATCH_AXIS, batch_sharding


def _shard(mesh, x):
    return jax.device_put(x, batch_sharding(mesh, jnp.ndim(x)))


@partial(jax.jit, static_argnames=("algorithm",))
def _inverse_annotated(a, algorithm: str):
    from cuda_matrix_inversion_tpu.ops.registry import get_inverse_algorithm

    return get_inverse_algorithm(algorithm)(a)


def sharded_inverse(mesh, a, algorithm: str = "lu"):
    """Invert a batch sharded over ``mesh``; returns a sharded device array.

    Input may be host (it will be scattered) or already sharded.
    """
    a_sharded = _shard(mesh, a)
    return _inverse_annotated(a_sharded, algorithm)


def sharded_inverse_shard_map(mesh, a, algorithm: str = "lu"):
    """Same, but via shard_map: the single-chip kernel runs verbatim on
    each chip's shard (no partitioner in the loop)."""
    from cuda_matrix_inversion_tpu.ops.registry import get_inverse_algorithm

    fn = get_inverse_algorithm(algorithm)
    spec = P(BATCH_AXIS, None, None)
    mapped = jax.shard_map(fn, mesh=mesh, in_specs=(spec,), out_specs=spec)
    return jax.jit(mapped)(_shard(mesh, a))


@partial(jax.jit, static_argnames=("method",))
def _gp_annotated(a, b, c, d, e, method: str):
    from cuda_matrix_inversion_tpu.models.gp import gp_mean_variance

    return gp_mean_variance(a, b, c, d, e, method=method)


def sharded_gp_mean_variance(mesh, a, b, c, d, e, method: str = "solve"):
    """The full GP pipeline with every operand sharded on the batch axis."""
    args = [_shard(mesh, x) for x in (a, b, c, d, e)]
    return _gp_annotated(*args, method=method)


def sharded_gp_shard_map(mesh, a, b, c, d, e, method: str = "solve"):
    from cuda_matrix_inversion_tpu.models.gp import gp_mean_variance

    spec3 = P(BATCH_AXIS, None, None)
    fn = partial(gp_mean_variance, method=method)
    mapped = jax.shard_map(
        fn, mesh=mesh, in_specs=(spec3,) * 5, out_specs=(spec3, spec3)
    )
    args = [_shard(mesh, x) for x in (a, b, c, d, e)]
    return jax.jit(mapped)(*args)
