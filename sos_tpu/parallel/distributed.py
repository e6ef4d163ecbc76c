"""Multi-host (multi-process) SPMD bring-up.

The reference is strictly single-host (`nn.DataParallel`,
m1 agent.py:167-173); this module is the TPU-pod equivalent: one jitted
SPMD program per process over a GLOBAL mesh, gradient psum over ICI/DCN
compiled by XLA, per-host input pipelines feeding disjoint data shards.

Usage (each process):

    from sos_tpu.parallel import distributed
    distributed.initialize()            # env-driven on TPU pods
    mesh = make_mesh()                  # global: all devices, all hosts
    batcher = batcher.shard(jax.process_index(), jax.process_count())
    ... fit(...) as usual — shard_batch()/replicate() are process-aware.

On Cloud TPU pods `jax.distributed.initialize()` discovers the
coordinator from the environment; elsewhere pass coordinator_address /
num_processes / process_id explicitly (tests drive a 2-process CPU
cluster this way: tests/test_multihost.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               require: bool = False) -> None:
    """Bring up the JAX distributed runtime. No-op if already initialized
    or if running single-process with no coordinator configured.

    `require=True` (the CLIs' --distributed path): a bring-up failure
    RAISES instead of silently degrading — otherwise every host of an
    intended pod run would train the full dataset independently and race
    on the shared checkpoint directory.

    Must run before anything touches the XLA backend (jax.devices(),
    any computation) — call it first thing in main()."""
    if jax.distributed.is_initialized():
        return
    if coordinator_address is None and num_processes is None:
        # TPU-pod auto-detection; harmless single-process otherwise
        try:
            jax.distributed.initialize()
        except Exception as exc:
            if require:
                raise RuntimeError(
                    "--distributed requested but jax.distributed auto-"
                    "detection failed (not on a TPU pod?). Pass "
                    "--coordinator host:port --num_processes N "
                    "--process_id K explicitly, or drop --distributed "
                    "for single-host training.") from exc
            return
    else:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)


def process_local_batch_size(global_batch: int) -> int:
    """The per-host slice of the global batch (must divide evenly)."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(
            f"process count {n} must divide the global batch "
            f"{global_batch} (pick batch_size as a multiple of {n})")
    return global_batch // n


def make_global_array(local: np.ndarray, sharding) -> jax.Array:
    """Assemble a global batch-sharded array from this process's shard."""
    return jax.make_array_from_process_local_data(sharding,
                                                  np.asarray(local))


def replicate(tree, sharding):
    """Replicate a host-local pytree onto a (possibly multi-host) mesh."""
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)

    def _rep(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx])

    return jax.tree.map(_rep, tree)
