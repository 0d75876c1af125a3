from gigapose_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    data_parallel_sharding,
)
from gigapose_tpu.parallel.sharded_store import (
    coarse_forward_sharded,
    make_dp_tv_mesh,
    shard_template_store,
    sharded_match_and_gather,
)
