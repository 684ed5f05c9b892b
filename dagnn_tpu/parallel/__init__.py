from dagnn_tpu.parallel.mesh import make_mesh
from dagnn_tpu.parallel.dp import stack_batches, make_dp_train_step

__all__ = ["make_mesh", "stack_batches", "make_dp_train_step"]
