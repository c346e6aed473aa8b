from .cd1 import (
    init_weights_sin,
    init_weights_gaussian,
    numpy_cd1_meanfield,
    cd1_gradient_df,
    forward_prop_df,
)
from .trainer import RBMTrainer, DBN

__all__ = [
    "init_weights_sin", "init_weights_gaussian", "numpy_cd1_meanfield",
    "cd1_gradient_df", "forward_prop_df", "RBMTrainer", "DBN",
]
