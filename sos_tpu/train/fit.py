"""Epoch-loop training driver shared by both stages.

Reproduces the reference training protocol (m1 train.py:44-99):

* epoch loop over the train batcher;
* a validation step every `val_frequency` train steps via a cycled test
  iterator;
* per-epoch full validation; the detector tracks `best_acc` and keeps a
  `best_acc` checkpoint (train.py:84-88);
* `ckpt_epoch{N}` + `latest` checkpoints each `save_frequency` epochs;
* scalar logging to tensorboardX train/val writers (agent.py:46-47,118-124)
  when tensorboardX is available, silent otherwise.

TPU-native execution: the batch is placed on the `data`-sharded mesh and
the jitted step (mix+STFT+model+grads+update, one XLA program) runs SPMD.
"""

from __future__ import annotations

import itertools
import json
import logging
import os
from typing import Callable, Dict, Optional

import jax
import numpy as np

from sos_tpu.config import ExperimentConfig
from sos_tpu.data.prefetch import prefetch
from sos_tpu.parallel import distributed, make_mesh, shard_batch, replicated
from sos_tpu.train.checkpoints import CheckpointManager
from sos_tpu.train.state import TrainClock, TrainState
from sos_tpu.utils import StepTimer, cycle


def _writers(log_dir: str):
    try:
        from tensorboardX import SummaryWriter

        return (SummaryWriter(os.path.join(log_dir, "train.events")),
                SummaryWriter(os.path.join(log_dir, "val.events")))
    except ImportError:  # pragma: no cover
        return None, None


class GracefulStop:
    """SIGTERM-aware preemption flag: the signal only sets a flag; fit()
    checks it at step boundaries, saves `latest` and returns cleanly, so
    a preempted run resumes EXACTLY via `--continue` (the mid-epoch
    resume machinery). Installed for the duration of fit() only; the
    previous handler is restored. Multi-host: the flag is agreed across
    processes (any host signaled -> all stop at the same step), so the
    checkpoint barrier cannot deadlock."""

    _NOT_INSTALLED = object()  # distinct from a previous handler of None

    # multi-host: agree on the flag only every N steps — a per-step
    # collective would block the host each step and defeat async
    # dispatch. All hosts check at the same step numbers, preserving
    # the no-deadlock property; signal response lags <= N steps.
    SYNC_EVERY = 10

    def __init__(self):
        self.requested = False
        self._prev = self._NOT_INSTALLED

    def _handler(self, signum, frame):
        self.requested = True

    def install(self) -> "GracefulStop":
        import signal

        try:
            self._prev = signal.signal(signal.SIGTERM, self._handler)
        except ValueError:  # not the main thread (e.g. under a test runner)
            self._prev = self._NOT_INSTALLED
        return self

    def uninstall(self) -> None:
        import signal

        if self._prev is not self._NOT_INSTALLED:
            signal.signal(signal.SIGTERM, self._prev)
            self._prev = self._NOT_INSTALLED

    def should_stop(self, step: int) -> bool:
        if jax.process_count() > 1:
            # a locally-requested stop must STILL wait for the common
            # sync step — breaking alone would deadlock the checkpoint
            # barrier on the other hosts
            if step % self.SYNC_EVERY != 0:
                return False
            from jax.experimental import multihost_utils

            flags = multihost_utils.process_allgather(
                np.asarray([1 if self.requested else 0]))
            return bool(np.asarray(flags).any())
        return self.requested


class MetricsLog:
    """Append-only JSONL training log — the durable, dependency-free
    record behind the tensorboard scalars (consumed by
    `python -m sos_tpu.cli.report --train_log <log_dir>`).

    One line per event: {"kind": "train"|"val"|"epoch", "step", "epoch",
    ...metrics}. Append mode keeps the history across resumed runs;
    multi-host: only process 0 writes."""

    def __init__(self, log_dir: str):
        self._fp = None
        if jax.process_index() == 0:
            os.makedirs(log_dir, exist_ok=True)
            self._fp = open(os.path.join(log_dir, "metrics.jsonl"), "a",
                            buffering=1)

    def write(self, kind: str, step: int, epoch: int, metrics: Dict) -> None:
        if self._fp is None:
            return
        row = {"kind": kind, "step": step, "epoch": epoch}
        for k, v in metrics.items():
            if np.ndim(v) == 0:
                row[k] = float(v)
        self._fp.write(json.dumps(row) + "\n")

    def close(self) -> None:
        if self._fp is not None:
            self._fp.close()


def fit(
    cfg: ExperimentConfig,
    state: TrainState,
    clock: TrainClock,
    train_step: Callable,
    eval_step: Callable,
    train_batcher,
    val_batcher,
    model_dir: str,
    log_dir: str,
    num_devices: Optional[int] = None,
    track_accuracy: bool = False,
    epoch_hook: Optional[Callable] = None,
    visualize_hook: Optional[Callable] = None,
    profile_dir: Optional[str] = None,
    profile_steps: tuple = (10, 15),
) -> TrainState:
    """Train to cfg.train.nr_epochs. With `profile_dir`, captures a
    jax.profiler trace of steps [profile_steps) — the observability the
    reference lacks entirely (SURVEY.md §5: 'tracing: none')."""
    if num_devices is None:
        if jax.process_count() > 1:
            # multi-host SPMD: every process must build the SAME global
            # mesh over ALL devices — no silent fallback possible
            num_devices = len(jax.devices())
            if cfg.train.batch_size % num_devices:
                raise ValueError(
                    f"multi-host: global batch {cfg.train.batch_size} must "
                    f"divide the global device count {num_devices}")
        else:
            # largest device count that divides the batch (dim 0 shards)
            num_devices = len(jax.devices())
            while cfg.train.batch_size % num_devices:
                num_devices -= 1
            if num_devices < len(jax.devices()):
                logging.getLogger(__name__).warning(
                    "batch_size=%d does not divide %d devices; training on "
                    "%d device(s). Pick a divisible batch to use the full "
                    "mesh.", cfg.train.batch_size, len(jax.devices()),
                    num_devices)
    mesh = make_mesh(num_devices=num_devices)
    mgr = CheckpointManager(model_dir)
    # multi-host: observability (tensorboard, jsonl, visualize hook) and
    # checkpoints write from process 0 only — the metrics are computed on
    # the global batch and identical on every host
    is_main = jax.process_index() == 0
    train_tb, val_tb = _writers(log_dir) if is_main else (None, None)
    jsonl = MetricsLog(log_dir)
    timer = StepTimer()
    # restored on --continue (clock.best_metric persists in the ckpt
    # sidecar) so the first post-resume epoch cannot clobber a better
    # best_acc snapshot from before the preemption. On a RESUME (the
    # clock has ticked — it came from a loaded checkpoint) the best_acc
    # sidecar itself is the authority when it's newer than the resumed
    # clock (a crash can land after a best_acc save but before the next
    # 'latest' save, leaving the resumed clock's copy stale). A fresh
    # run (zero clock) into a reused model_dir deliberately does NOT
    # peek: it must be free to overwrite a previous run's best_acc with
    # its own first best, like the reference's per-run in-memory best
    # (m1 train.py:57,84-88).
    best_metric = clock.best_metric
    if track_accuracy and (clock.step > 0 or clock.epoch > 0):
        # the peek is a per-host filesystem read feeding the condition
        # that guards the barriered best_acc save — every host must see
        # one value or the pod deadlocks in sync_global_devices, so
        # process 0 reads and broadcasts
        peek = (mgr.peek_best_metric("best_acc") if is_main
                else float("-inf"))
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            peek = float(multihost_utils.broadcast_one_to_all(
                np.float32(peek)))
        best_metric = max(best_metric, peek)

    val_batcher.set_epoch(0)
    has_val = len(val_batcher) > 0
    val_iter = cycle(lambda: iter(val_batcher)) if has_val else None

    start_epoch, start_minibatch = clock.epoch, clock.minibatch
    stop = GracefulStop().install()
    preempted = False
    # profiler state as a flag, not step equality: a resume whose
    # restored step lands inside (start, stop] must neither call
    # stop_trace without a start nor leave a started trace dangling
    tracing = False
    try:
      with mesh:
        state = distributed.replicate(state, replicated(mesh))
        for epoch in range(start_epoch, cfg.train.nr_epochs):
            train_batcher.set_epoch(epoch)
            # Background prefetch: the next batch assembles on a host
            # thread while the device runs the current step (the
            # reference's 60-worker DataLoader, collapsed to what this
            # pipeline actually needs — assembly is indexing + memcpy).
            skip = start_minibatch if epoch == start_epoch else 0
            if skip:
                # exact mid-epoch resume: the batch order is epoch-seeded
                # and deterministic, so skipping the completed minibatches
                # continues the run bit-for-bit. Batchers that support
                # `iter_from` skip at the index level (rng replay only, no
                # audio decode); plain iterables fall back to consuming
                # the assembled prefix.
                logging.getLogger(__name__).info(
                    "resuming epoch %d at minibatch %d", epoch, skip)
            if skip and hasattr(train_batcher, "iter_from"):
                src = train_batcher.iter_from(skip)
            else:
                src = iter(train_batcher)
                if skip:
                    src = itertools.islice(src, skip, None)
            # close() the prefetcher on EVERY loop exit (SIGTERM break,
            # train_step exception): the producer thread holds a ref to
            # it, so it is never garbage-collected while running — an
            # unclosed early exit would leave the thread assembling and
            # spinning on the full queue for the life of the process
            prefetcher = prefetch(src, depth=2)
            try:
              for batch in prefetcher:
                if (profile_dir and not tracing
                        and clock.step == profile_steps[0]):
                    jax.profiler.start_trace(profile_dir)
                    tracing = True
                if tracing and clock.step >= profile_steps[1]:
                    jax.profiler.stop_trace()
                    tracing = False
                timer.start()
                sharded = shard_batch(batch, mesh)
                state, metrics = train_step(state, sharded)
                timer.stop()
                if clock.step % 10 == 0:
                    if train_tb:
                        for k, v in metrics.items():
                            if np.ndim(v) == 0:
                                train_tb.add_scalar(k, float(v),
                                                    global_step=clock.step)
                        train_tb.add_scalar("steps_per_sec",
                                            timer.steps_per_sec,
                                            global_step=clock.step)
                    jsonl.write("train", clock.step, clock.epoch,
                                dict(metrics,
                                     steps_per_sec=timer.steps_per_sec))
                if has_val and clock.step % cfg.train.val_frequency == 0:
                    vmetrics = eval_step(state, shard_batch(next(val_iter), mesh))
                    if val_tb:
                        for k, v in vmetrics.items():
                            if np.ndim(v) == 0:
                                val_tb.add_scalar(k, float(v),
                                                  global_step=clock.step)
                    jsonl.write("val", clock.step, clock.epoch, vmetrics)
                if (visualize_hook and is_main
                        and clock.step % cfg.train.visualize_frequency == 0):
                    visualize_hook(train_tb, state, batch, clock.step)
                clock.tick()
                if (cfg.train.save_step_frequency
                        and clock.step % cfg.train.save_step_frequency == 0):
                    mgr.save(state, clock, "latest")
                if stop.should_stop(clock.step):
                    # preemption: fall through to the final `latest` save
                    # — with the minibatch cursor in the clock, a
                    # `--continue` resume picks up at the NEXT batch of
                    # this epoch exactly
                    logging.getLogger(__name__).warning(
                        "SIGTERM: stopping at step %d (epoch %d, "
                        "minibatch %d); saving latest", clock.step,
                        clock.epoch, clock.minibatch)
                    preempted = True
                    break
            finally:
                prefetcher.close()
            if preempted:
                break
            clock.tock()

            # full validation pass
            val_batcher.set_epoch(epoch)
            agg: Dict[str, list] = {}
            for batch in val_batcher:
                out = eval_step(state, shard_batch(batch, mesh))
                for k, v in out.items():
                    if np.ndim(v) == 0:
                        agg.setdefault(k, []).append(float(v))
            epoch_metrics = {k: float(np.mean(v)) for k, v in agg.items()}
            if val_tb:
                for k, v in epoch_metrics.items():
                    val_tb.add_scalar(f"epoch_{k}", v, global_step=epoch)
            # `epoch` (the loop index) matches the train/val rows of this
            # epoch; clock.epoch has already tocked to epoch+1, which is
            # the ckpt_epoch{N} name the epoch's checkpoint gets
            jsonl.write("epoch", clock.step, epoch,
                        dict(epoch_metrics, ckpt_epoch=clock.epoch))
            if track_accuracy and epoch_metrics.get("accuracy", -np.inf) > best_metric:
                best_metric = epoch_metrics["accuracy"]
                clock.best_metric = best_metric  # persists with every save
                mgr.save(state, clock, "best_acc")
            if clock.epoch % cfg.train.save_frequency == 0:
                mgr.save_epoch(state, clock)
            if epoch_hook:
                epoch_hook(epoch, state, epoch_metrics)
        # The final 'latest' save runs while the graceful-SIGTERM handler
        # is still installed: preemption systems routinely deliver SIGTERM
        # more than once, and reverting to the default handler before this
        # write would let a repeat signal kill the process mid-checkpoint
        # — corrupting the very 'latest' the graceful stop exists to save.
        mgr.save(state, clock, "latest")
    finally:
        # exception-safe teardown (OOM/interrupt): the jsonl handle and
        # the tensorboard writers must not leak buffered events
        if tracing:
            jax.profiler.stop_trace()
        stop.uninstall()
        jsonl.close()
        for writer in (train_tb, val_tb):
            if writer is not None:
                writer.close()
    return state
