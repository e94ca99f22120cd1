from dcanet_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from dcanet_tpu.parallel.sharding import make_disp_constraint

__all__ = ["make_mesh", "replicate", "shard_batch", "make_disp_constraint"]
