"""Device-mesh parallelism (new capability vs the single-device reference)."""

from titanet_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
