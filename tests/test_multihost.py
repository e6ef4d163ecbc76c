"""Multi-host SPMD: a real 2-process CPU 'pod' runs sharded train steps.

Spawns two OS processes (tests/multihost_worker.py), each owning 2
virtual CPU devices of a 4-device global mesh, connected through
jax.distributed. Asserts:
  * both hosts converge to the SAME replicated parameters (the psum
    gradient reduction spans processes);
  * the result matches a single-process run over the same global batches
    (multi-host is numerically transparent).

This is the bring-up path the reference cannot express at all
(nn.DataParallel is single-process; SURVEY.md §2.4).
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def worker_results():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # the workers force their own backend config; scrub the test session's
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests",
                                          "multihost_worker.py"),
             str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True)
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    results = {}
    for out in outs:
        m = re.search(r"RESULT pid=(\d) checksum=([-\d.]+) loss=([-\d.]+)",
                      out)
        assert m, f"no RESULT line in:\n{out[-3000:]}"
        results[int(m.group(1))] = (float(m.group(2)), float(m.group(3)))
    return results


def test_two_hosts_agree(worker_results):
    assert set(worker_results) == {0, 1}
    (c0, l0), (c1, l1) = worker_results[0], worker_results[1]
    np.testing.assert_allclose(c0, c1, rtol=1e-7)
    np.testing.assert_allclose(l0, l1, rtol=1e-7)


def test_matches_single_process(worker_results):
    """Single-process run over the same global batches ends at the same
    parameters (multi-host sharding changes nothing numerically)."""
    import jax
    from sos_tpu.parallel import make_mesh, replicated, shard_batch
    from sos_tpu.train.loop import (init_detector_state,
                                    make_detector_train_step)
    from tests.test_train import tiny_detector_cfg, _detector_batch

    cfg = tiny_detector_cfg()
    model, state = init_detector_state(cfg, steps_per_epoch=3)
    step = make_detector_train_step(cfg, model, steps_per_epoch=3)
    mesh = make_mesh(num_devices=4)
    with mesh:
        state = jax.device_put(state, replicated(mesh))
        for i in range(3):
            batch = _detector_batch(cfg, 4, seed=i)
            state, _ = step(state, shard_batch(batch, mesh))
    checksum = sum(float(np.sum(np.asarray(leaf)))
                   for leaf in jax.tree.leaves(state.params))
    np.testing.assert_allclose(checksum, worker_results[0][0], rtol=1e-6)


def test_distributed_helpers_single_process():
    """Single-process behavior of the distributed helpers."""
    import jax
    import pytest as _pytest

    from sos_tpu.parallel import distributed, make_mesh, replicated

    # initialize() with no coordinator: harmless no-op single-process
    distributed.initialize()
    assert jax.process_count() == 1

    assert distributed.process_local_batch_size(8) == 8
    with _pytest.raises(ValueError):
        # indivisible global batch must be rejected loudly
        orig = jax.process_count
        try:
            jax.process_count = lambda: 3  # simulate a 3-host pod
            distributed.process_local_batch_size(8)
        finally:
            jax.process_count = orig

    mesh = make_mesh(num_devices=2)
    tree = {"a": np.ones((3, 4), np.float32)}
    out = distributed.replicate(tree, replicated(mesh))
    np.testing.assert_array_equal(np.asarray(out["a"]), tree["a"])
