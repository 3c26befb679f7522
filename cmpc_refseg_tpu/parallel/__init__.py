"""Device-mesh parallelism: mesh construction, sharding, distributed init."""

from cmpc_refseg_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, shard_batch, replicate, data_sharding)
