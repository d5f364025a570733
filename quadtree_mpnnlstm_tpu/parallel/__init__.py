from quadtree_mpnnlstm_tpu.parallel.mesh import make_mesh
from quadtree_mpnnlstm_tpu.parallel.dp import make_dp_train_step

__all__ = ["make_mesh", "make_dp_train_step"]
