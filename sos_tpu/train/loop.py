"""Jitted train/eval steps for both stages + optimizer/schedule factories.

Loss definitions match the reference agents:

* detector — `BCEWithLogitsLoss` over per-frame logits vs 60-frame labels
  (m1 agent.py:185-206); eval adds per-frame accuracy at sigmoid>=0.5
  (m1 agent.py:208-232).
* denoiser — `MSE(noise_pred, full_noise) + MSE(icrm(mixed, mask), clean)`
  with the in-graph differentiable cRM inverse (m2 agent.py:176-190,
  transform.py:156-169).

Optimizer: Adam(lr=1e-3) with a StepLR-equivalent staircase decay
(gamma=0.1 every 15 epochs; m1 agent.py:175-183 + torch defaults).

The device-side mixing/STFT stage (sos_tpu.data.pipeline) is *inside*
each train step, so one XLA program does mask -> mix -> STFT -> model ->
loss -> grads -> psum -> update. Batches are sharded over the `data` mesh
axis; parameters are replicated (see sos_tpu.parallel). BatchNorm batch
statistics are computed over the *global* batch under SPMD (sync-BN) — a
documented improvement over DataParallel's per-replica stats.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from sos_tpu.config import ExperimentConfig
from sos_tpu.data.pipeline import (
    device_mix_and_stft_denoiser,
    device_mix_and_stft_detector,
)
from sos_tpu.dsp.crm import apply_compressed_crm
from sos_tpu.models import JointDenoiser, SilenceDetector
from sos_tpu.train.state import TrainState


def make_lr_schedule(cfg: ExperimentConfig, steps_per_epoch: int):
    """StepLR(step_size=lr_step_size, gamma) as a step-indexed staircase."""
    boundary = max(1, steps_per_epoch * cfg.train.lr_step_size)
    return optax.exponential_decay(
        init_value=cfg.train.lr,
        transition_steps=boundary,
        decay_rate=cfg.train.lr_gamma,
        staircase=True,
    )


def make_optimizer(cfg: ExperimentConfig, steps_per_epoch: int):
    return optax.adam(make_lr_schedule(cfg, steps_per_epoch))


def _schedule_count(opt_state, fallback):
    """The optimizer's own schedule count — this, not `state.step`, is
    what Adam indexes the staircase with: guarded_update reverts the
    count on a skipped non-finite step while `step` always advances, so
    after any skip the two diverge and the logged lr would lie."""
    leaves = jax.tree_util.tree_leaves(
        opt_state,
        is_leaf=lambda x: isinstance(x, optax.ScaleByScheduleState))
    for leaf in leaves:
        if isinstance(leaf, optax.ScaleByScheduleState):
            return leaf.count
    return fallback


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def init_detector_state(cfg: ExperimentConfig, steps_per_epoch: int,
                        rng: Optional[jax.Array] = None,
                        variables: Optional[Dict] = None) -> Tuple[SilenceDetector, TrainState]:
    model = SilenceDetector(cfg.detector,
                            compute_dtype=cfg.train.compute_dtype,
                            remat=cfg.train.remat)
    if variables is None:
        rng = rng if rng is not None else jax.random.PRNGKey(cfg.train.seed)
        t = 1 + int(cfg.data.clip_frames / cfg.data.frame_rate
                    * cfg.data.sample_rate) // cfg.stft.hop_length
        dummy = jnp.zeros((1, cfg.detector.freq_bins, t, 2))
        # jit the init: eager init issues one RPC per parameter on
        # remote/tunneled TPUs (minutes at full size); jit is one program
        variables = jax.jit(
            lambda k: model.init(k, dummy, train=False))(rng)
    tx = make_optimizer(cfg, steps_per_epoch)
    state = TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    return model, state


def init_denoiser_state(cfg: ExperimentConfig, steps_per_epoch: int,
                        rng: Optional[jax.Array] = None,
                        variables: Optional[Dict] = None) -> Tuple[JointDenoiser, TrainState]:
    model = JointDenoiser(cfg.denoiser,
                          compute_dtype=cfg.train.compute_dtype,
                          remat=cfg.train.remat)
    if variables is None:
        rng = rng if rng is not None else jax.random.PRNGKey(cfg.train.seed)
        t = 1 + cfg.data.clip_seconds * cfg.data.sample_rate // cfg.stft.hop_length
        dummy = jnp.zeros((1, cfg.denoiser.freq_bins, t, 2))
        variables = jax.jit(
            lambda k: model.init(k, dummy, dummy, train=False))(rng)
    tx = make_optimizer(cfg, steps_per_epoch)
    state = TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    return model, state


# ---------------------------------------------------------------------------
# Detector steps
# ---------------------------------------------------------------------------


def _all_finite(tree) -> jnp.ndarray:
    return jnp.all(jnp.asarray([jnp.all(jnp.isfinite(g))
                                for g in jax.tree.leaves(tree)]))


def guarded_update(tx, state: TrainState, grads, new_stats, enabled: bool):
    """Apply the optimizer update only when EVERY gradient is finite.

    A single inf/NaN batch (corrupt audio, overflow at low precision)
    would otherwise poison the parameters, the Adam moments AND the
    BatchNorm running stats permanently — the reference has no such
    guard and dies by restart-from-checkpoint. The skip happens in-graph
    (jnp.where), so the step stays one XLA program with no host sync.

    Returns (new_params, new_opt, new_stats, finite_flag).
    """
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    if not enabled:
        return new_params, new_opt, new_stats, jnp.bool_(True)
    finite = _all_finite(grads)
    keep = lambda n, o: jnp.where(finite, n, o)
    new_params = jax.tree.map(keep, new_params, state.params)
    new_opt = jax.tree.map(keep, new_opt, state.opt_state)
    new_stats = jax.tree.map(keep, new_stats, state.batch_stats)
    return new_params, new_opt, new_stats, finite


def _bce_with_logits(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    # mean over all frames/batch, identical to BCEWithLogitsLoss default
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def weighted_bce_with_logits(logits: jnp.ndarray, labels: jnp.ndarray,
                             weights: Tuple[float, float] = (1.0, 1.0)) -> jnp.ndarray:
    """Class-weighted BCE (reference `weighted_binary_cross_entropy`,
    m1 tools.py:541-577 — kept available though the final detector uses
    the unweighted loss). weights = (w_negative, w_positive)."""
    p = jax.nn.log_sigmoid(logits)
    q = jax.nn.log_sigmoid(-logits)  # log(1 - sigmoid)
    loss = -(weights[1] * labels * p + weights[0] * (1.0 - labels) * q)
    return jnp.mean(loss)


def make_detector_train_step(cfg: ExperimentConfig, model: SilenceDetector,
                             steps_per_epoch: int) -> Callable:
    tx = make_optimizer(cfg, steps_per_epoch)

    # remat happens per-block inside the model (cfg.train.remat)
    def fwd(params, batch_stats, audio):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            audio, num_frames=cfg.data.clip_frames,
            train=True, mutable=["batch_stats"])

    @jax.jit
    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        prepared = device_mix_and_stft_detector(
            batch["clean"], batch["noise"], batch["snr"], batch["bits"],
            cfg.data, cfg.stft)

        def loss_fn(params):
            outs, mutated = fwd(params, state.batch_stats, prepared["audio"])
            loss = _bce_with_logits(outs, prepared["label"])
            return loss, (mutated["batch_stats"], outs)

        (loss, (new_stats, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_params, new_opt, new_stats, finite = guarded_update(
            tx, state, grads, new_stats, cfg.train.skip_nonfinite_updates)
        acc = jnp.mean(((jax.nn.sigmoid(logits) >= 0.5).astype(jnp.float32)
                        == prepared["label"]).astype(jnp.float32))
        metrics = {"loss": loss, "accuracy": acc,
                   "finite": finite.astype(jnp.float32),
                   "lr": make_lr_schedule(cfg, steps_per_epoch)(
                       _schedule_count(state.opt_state, state.step))}
        return TrainState(new_params, new_stats, new_opt, state.step + 1), metrics

    return train_step


def make_detector_eval_step(cfg: ExperimentConfig, model: SilenceDetector) -> Callable:
    @jax.jit
    def eval_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        prepared = device_mix_and_stft_detector(
            batch["clean"], batch["noise"], batch["snr"], batch["bits"],
            cfg.data, cfg.stft)
        logits = model.apply(state.variables(), prepared["audio"],
                             num_frames=cfg.data.clip_frames, train=False)
        loss = _bce_with_logits(logits, prepared["label"])
        pred = (jax.nn.sigmoid(logits) >= 0.5).astype(jnp.float32)
        acc = jnp.mean((pred == prepared["label"]).astype(jnp.float32))
        return {"loss": loss, "accuracy": acc, "pred": pred,
                "label": prepared["label"]}

    return eval_step


# ---------------------------------------------------------------------------
# Denoiser steps
# ---------------------------------------------------------------------------


def make_denoiser_train_step(cfg: ExperimentConfig, model: JointDenoiser,
                             steps_per_epoch: int) -> Callable:
    tx = make_optimizer(cfg, steps_per_epoch)

    # remat happens per-block inside the model (cfg.train.remat)
    def fwd(params, batch_stats, mixed, noise):
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            mixed, noise, train=True, mutable=["batch_stats"])

    @jax.jit
    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        d = device_mix_and_stft_denoiser(
            batch["clean"], batch["noise"], batch["snr"], batch["bits"],
            cfg.data, cfg.stft)

        def loss_fn(params):
            (noise_pred, mask), mutated = fwd(params, state.batch_stats,
                                              d["mixed"], d["noise"])
            rec = apply_compressed_crm(d["mixed"], mask)
            loss_inpaint = jnp.mean((noise_pred - d["full_noise"]) ** 2)
            loss_rec = jnp.mean((rec - d["clean"]) ** 2)
            return loss_inpaint + loss_rec, (
                mutated["batch_stats"], loss_inpaint, loss_rec)

        (loss, (new_stats, l1, l2)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_params, new_opt, new_stats, finite = guarded_update(
            tx, state, grads, new_stats, cfg.train.skip_nonfinite_updates)
        metrics = {"loss": loss, "stage1": l1, "stage2": l2,
                   "finite": finite.astype(jnp.float32),
                   "lr": make_lr_schedule(cfg, steps_per_epoch)(
                       _schedule_count(state.opt_state, state.step))}
        return TrainState(new_params, new_stats, new_opt, state.step + 1), metrics

    return train_step


def make_denoiser_eval_step(cfg: ExperimentConfig, model: JointDenoiser) -> Callable:
    @jax.jit
    def eval_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        d = device_mix_and_stft_denoiser(
            batch["clean"], batch["noise"], batch["snr"], batch["bits"],
            cfg.data, cfg.stft)
        noise_pred, mask = model.apply(state.variables(), d["mixed"],
                                       d["noise"], train=False)
        rec = apply_compressed_crm(d["mixed"], mask)
        return {
            "stage1": jnp.mean((noise_pred - d["full_noise"]) ** 2),
            "stage2": jnp.mean((rec - d["clean"]) ** 2),
        }

    return eval_step
