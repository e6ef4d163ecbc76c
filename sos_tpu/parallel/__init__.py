"""SPMD parallelism over the TPU mesh (the reference's nn.DataParallel, done right)."""

from sos_tpu.parallel import distributed  # noqa: F401
from sos_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
)
