"""Device-mesh parallelism (new capability vs the single-device reference)."""

from titanet_tpu.parallel.distributed import (  # noqa: F401
    global_batch_array,
    maybe_initialize_distributed,
)
from titanet_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
