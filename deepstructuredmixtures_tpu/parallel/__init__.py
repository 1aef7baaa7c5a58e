from .mesh import (
    make_mesh,
    shard_batch,
    pad_leaves,
    make_sharded_mll_fn,
    make_sharded_train_step,
    make_sharded_routed_predict,
    sharded_bucketed_streamed_predict,
    sharded_fit,
)
from .dist_chol import (
    sharded_cholesky,
    sharded_solve_lower,
    sharded_solve_lower_t,
    sharded_gp_fit,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "pad_leaves",
    "make_sharded_mll_fn",
    "make_sharded_train_step",
    "make_sharded_routed_predict",
    "sharded_bucketed_streamed_predict",
    "sharded_fit",
    "sharded_cholesky",
    "sharded_solve_lower",
    "sharded_solve_lower_t",
    "sharded_gp_fit",
]
