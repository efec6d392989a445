from cuda_matrix_inversion_tpu.utils.errors import ensure, fail, div_ceil
from cuda_matrix_inversion_tpu.utils.timer import Timer, WelfordAccumulator

__all__ = ["ensure", "fail", "div_ceil", "Timer", "WelfordAccumulator"]
