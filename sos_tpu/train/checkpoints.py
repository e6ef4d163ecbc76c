"""Checkpoint management: orbax pytrees with the reference's naming/semantics.

Reference behavior being preserved (m1 agent.py:62-100, train.py:84-95):
one checkpoint per epoch named `ckpt_epoch{N}`, a rolling `latest`, and a
`best_acc` snapshot; each stores model weights, optimizer state, the LR
schedule position and the TrainClock. Loading by epoch number restores
all of them. Additionally, a PyTorch `.pth` can be imported as the
initial state (weights + running stats only) for parity evaluation.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from sos_tpu.train.state import TrainClock, TrainState


class CheckpointManager:
    def __init__(self, model_dir: str):
        self.model_dir = os.path.abspath(model_dir)
        os.makedirs(self.model_dir, exist_ok=True)
        self._ckptr = ocp.PyTreeCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.model_dir, name)

    # -- save ---------------------------------------------------------------
    def save(self, state: TrainState, clock: TrainClock, name: str) -> str:
        path = self._path(name)
        # Multi-host: the state is fully replicated (every leaf is fully
        # addressable on every process), so only process 0 writes — the
        # others would race on a shared filesystem.
        try:
            if jax.process_index() == 0:
                # materialize to host numpy: fully-replicated global
                # arrays are readable on any process, and orbax then
                # needs no cross-host coordination protocol
                tree = jax.tree.map(np.asarray, {
                    "params": state.params,
                    "batch_stats": state.batch_stats,
                    "opt_state": state.opt_state,
                    "step": state.step,
                })
                self._ckptr.save(path, tree, force=True)
                # atomic sidecar: a hard kill mid-write must never leave
                # a truncated clock.json (which would crash every
                # --continue). A kill BETWEEN the pytree write and this
                # replace leaves new weights + the previous clock — the
                # resume then replays a bounded suffix of minibatches
                # deterministically, which is safe; a torn file is not.
                tmp = path + ".clock.json.tmp"
                with open(tmp, "w") as fp:
                    json.dump(clock.to_dict(), fp)
                    # os.replace is atomic only against process death;
                    # without fsync a machine-level teardown can persist
                    # the rename before the data blocks, leaving a
                    # zero-length clock.json — the torn state this path
                    # exists to prevent
                    fp.flush()
                    os.fsync(fp.fileno())
                os.replace(tmp, path + ".clock.json")
        finally:
            # Barrier: no process may report this step's checkpoint done
            # (and become eligible for preemption/teardown) until
            # process 0's write is durable — otherwise a teardown
            # triggered by a fast host can kill the writer mid-write,
            # corrupting 'latest'. In the finally so a FAILED write on
            # process 0 still releases the other processes (process 0
            # then surfaces the real error) instead of deadlocking them
            # in the collective.
            if jax.process_count() > 1:
                from jax.experimental import multihost_utils

                multihost_utils.sync_global_devices(f"ckpt_saved:{name}")
        return path

    def save_epoch(self, state: TrainState, clock: TrainClock) -> str:
        path = self.save(state, clock, f"ckpt_epoch{clock.epoch}")
        self.save(state, clock, "latest")
        return path

    # -- load ---------------------------------------------------------------
    def exists(self, name: str) -> bool:
        return os.path.isdir(self._path(name))

    def peek_best_metric(self, name: str) -> float:
        """Read just `best_metric` from a checkpoint's clock sidecar
        (-inf when the sidecar or field is absent) — lets fit() seed its
        best-metric tracking from the best_acc snapshot itself, which
        can be newer than the resumed clock's copy."""
        clock_path = self._path(name) + ".clock.json"
        try:
            with open(clock_path) as fp:
                return float(json.load(fp).get("best_metric",
                                               float("-inf")))
        # AttributeError: valid JSON that isn't an object ('null', '[1]');
        # TypeError: {"best_metric": null} — tolerate every torn/foreign
        # sidecar shape, same policy as the clock-sidecar loader
        except (OSError, ValueError, TypeError, AttributeError):
            return float("-inf")

    def load(self, name: str,
             template: Optional[TrainState] = None) -> Tuple[TrainState, TrainClock]:
        path = self._path(name)
        if template is not None:
            target = {
                "params": template.params,
                "batch_stats": template.batch_stats,
                "opt_state": template.opt_state,
                "step": np.asarray(template.step),
            }
            tree = self._ckptr.restore(path, item=target)
        else:
            tree = self._ckptr.restore(path)
        clock_path = path + ".clock.json"
        clock = TrainClock()
        if os.path.exists(clock_path):
            with open(clock_path) as fp:
                clock = TrainClock.from_dict(json.load(fp))
        state = TrainState(
            params=tree["params"],
            batch_stats=tree["batch_stats"],
            opt_state=tree["opt_state"],
            step=jax.numpy.asarray(tree["step"]),
        )
        return state, clock

    def load_epoch(self, epoch: int,
                   template: Optional[TrainState] = None) -> Tuple[TrainState, TrainClock]:
        return self.load(f"ckpt_epoch{epoch}", template)


def state_from_torch_variables(variables: Dict[str, Any],
                               template: TrainState) -> TrainState:
    """Overlay imported .pth weights/stats onto a freshly-initialized state.

    Optimizer state and step restart from zero (parity evaluation only
    needs weights; continuing training from a torch checkpoint resets the
    optimizer like the reference's scheduler would on a fresh run).
    """

    def _check(new, old):
        new = jax.numpy.asarray(new)
        assert new.shape == old.shape, (new.shape, old.shape)
        return new.astype(old.dtype)

    params = jax.tree.map(_check, variables["params"], template.params)
    stats = jax.tree.map(_check, variables.get("batch_stats", {}),
                         template.batch_stats)
    return TrainState(params=params, batch_stats=stats,
                      opt_state=template.opt_state, step=template.step)
