from cuda_matrix_inversion_tpu.models.gp import (
    gp_mean,
    gp_variance,
    gp_mean_variance,
    gp_mean_host,
    gp_variance_host,
)

__all__ = [
    "gp_mean",
    "gp_variance",
    "gp_mean_variance",
    "gp_mean_host",
    "gp_variance_host",
]
