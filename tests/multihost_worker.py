"""Worker process for tests/test_multihost.py: one host of a 2-process
CPU 'pod' running real sharded detector train steps.

Each process owns 2 virtual CPU devices (global mesh = 4), assembles its
LOCAL half of a deterministic global batch, and runs 3 SPMD train steps
through the production stack (distributed.initialize -> make_mesh ->
distributed.replicate -> shard_batch -> train_step). Prints a params
checksum; the test asserts both hosts agree and match a single-process
run on the same global batches.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main() -> None:
    pid, port = int(sys.argv[1]), sys.argv[2]
    from sos_tpu.parallel import distributed, make_mesh, replicated, \
        shard_batch

    distributed.initialize(f"127.0.0.1:{port}", 2, pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, len(jax.devices())
    assert distributed.process_local_batch_size(4) == 2

    from tests.test_train import tiny_detector_cfg, _detector_batch
    from sos_tpu.train.loop import (init_detector_state,
                                    make_detector_train_step)

    cfg = tiny_detector_cfg()  # batch_size=2 in cfg; we drive batches of 4
    model, state = init_detector_state(cfg, steps_per_epoch=3)
    step = make_detector_train_step(cfg, model, steps_per_epoch=3)

    mesh = make_mesh()  # global: 4 devices across 2 processes
    with mesh:
        state = distributed.replicate(state, replicated(mesh))
        for i in range(3):
            gbatch = _detector_batch(cfg, 4, seed=i)  # deterministic global
            local = {k: v[pid * 2:(pid + 1) * 2] for k, v in gbatch.items()}
            sharded = shard_batch(local, mesh)
            state, metrics = step(state, sharded)
        checksum = sum(float(np.sum(np.asarray(leaf)))
                       for leaf in jax.tree.leaves(state.params))
        loss = float(metrics["loss"])
    print(f"RESULT pid={pid} checksum={checksum:.8f} loss={loss:.8f}",
          flush=True)


if __name__ == "__main__":
    main()
