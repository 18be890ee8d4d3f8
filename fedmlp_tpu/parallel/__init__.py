from fedmlp_tpu.parallel.mesh import (
    make_mesh,
    shard_stacked,
    replicate,
    client_sharding,
)

__all__ = ["make_mesh", "shard_stacked", "replicate", "client_sharding"]
