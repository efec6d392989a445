from cuda_matrix_inversion_tpu.parallel.mesh import batch_mesh, batch_sharding
from cuda_matrix_inversion_tpu.parallel.sharded import (
    sharded_inverse,
    sharded_gp_mean_variance,
)

__all__ = [
    "batch_mesh",
    "batch_sharding",
    "sharded_inverse",
    "sharded_gp_mean_variance",
]
