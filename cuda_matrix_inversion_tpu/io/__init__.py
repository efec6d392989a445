from cuda_matrix_inversion_tpu.io.mats import read_mats, write_mats, read_test_folder
from cuda_matrix_inversion_tpu.io.replicate import replicate_matrices

__all__ = ["read_mats", "write_mats", "read_test_folder", "replicate_matrices"]
