from .math import sigmoid_col, normalize_col, quantize_col
from .vector import dot_col, l2norm_col, cosine_col, det_hash64

__all__ = [
    "sigmoid_col", "normalize_col", "quantize_col",
    "dot_col", "l2norm_col", "cosine_col", "det_hash64",
]
