from .schur_sharded import make_sharded_schur_step
from .sharding import (make_sharded_banded_lm_step, make_sharded_lm_step,
                       make_sharded_normal_fn, pad_groups_for_mesh)

__all__ = [
    "make_sharded_normal_fn",
    "make_sharded_lm_step",
    "make_sharded_banded_lm_step",
    "make_sharded_schur_step",
    "pad_groups_for_mesh",
]
