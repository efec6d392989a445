from cuda_matrix_inversion_tpu.ops.registry import (
    get_inverse_algorithm,
    list_inverse_algorithms,
)

__all__ = ["get_inverse_algorithm", "list_inverse_algorithms"]
