from sketchformer_tpu.parallel.mesh import make_mesh
from sketchformer_tpu.parallel.sharding import (
    get_param_specs,
    shard_batch,
    shard_state,
)
