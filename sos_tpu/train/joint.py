"""Joint end-to-end training: detector + denoiser in one SPMD step.

The reference trains the stages separately (stage 2 consumes ground-truth
silent intervals during training, m2 dataset.py:167-193). This module adds
the BASELINE config[3] capability — one jitted step that:

  * runs the device-side mixing/STFT stage once for both models,
  * trains the detector with per-frame BCE against the ground-truth bits,
  * trains the denoiser with the dual MSE loss, its gated-noise input
    built from the ground-truth bits (teacher forcing — the detector's
    thresholded output is not differentiable, and the reference's stage-2
    training also uses ground truth),
  * psums gradients for both parameter trees over the data mesh axis.

Both models share the batch and the data pipeline, halving input work vs
running the two reference trainers.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from sos_tpu.config import ExperimentConfig
from sos_tpu.data.pipeline import device_mix_and_stft_denoiser
from sos_tpu.dsp.crm import apply_compressed_crm
from sos_tpu.models import JointDenoiser, SilenceDetector
from sos_tpu.train.loop import (
    _bce_with_logits,
    guarded_update,
    init_denoiser_state,
    init_detector_state,
    make_optimizer,
)
from sos_tpu.train.state import TrainState


def init_joint_states(cfg: ExperimentConfig, steps_per_epoch: int,
                      seed: int = 0):
    det_model, det_state = init_detector_state(
        cfg, steps_per_epoch, rng=jax.random.PRNGKey(seed))
    den_model, den_state = init_denoiser_state(
        cfg, steps_per_epoch, rng=jax.random.PRNGKey(seed + 1))
    return (det_model, det_state), (den_model, den_state)


def make_joint_train_step(cfg: ExperimentConfig, det_model: SilenceDetector,
                          den_model: JointDenoiser,
                          steps_per_epoch: int) -> Callable:
    tx_det = make_optimizer(cfg, steps_per_epoch)
    tx_den = make_optimizer(cfg, steps_per_epoch)

    @jax.jit
    def train_step(det_state: TrainState, den_state: TrainState,
                   batch: Dict[str, jnp.ndarray]):
        d = device_mix_and_stft_denoiser(
            batch["clean"], batch["noise"], batch["snr"], batch["bits"],
            cfg.data, cfg.stft)

        def det_loss_fn(params):
            logits, mutated = det_model.apply(
                {"params": params, "batch_stats": det_state.batch_stats},
                d["mixed"], num_frames=cfg.data.clip_frames,
                train=True, mutable=["batch_stats"])
            loss = _bce_with_logits(logits, batch["bits"])
            acc = jnp.mean(((jax.nn.sigmoid(logits) >= 0.5).astype(jnp.float32)
                            == batch["bits"]).astype(jnp.float32))
            return loss, (mutated["batch_stats"], acc)

        def den_loss_fn(params):
            (noise_pred, mask), mutated = den_model.apply(
                {"params": params, "batch_stats": den_state.batch_stats},
                d["mixed"], d["noise"], train=True, mutable=["batch_stats"])
            rec = apply_compressed_crm(d["mixed"], mask)
            l1 = jnp.mean((noise_pred - d["full_noise"]) ** 2)
            l2 = jnp.mean((rec - d["clean"]) ** 2)
            return l1 + l2, (mutated["batch_stats"], l1, l2)

        (det_loss, (det_stats, det_acc)), det_grads = jax.value_and_grad(
            det_loss_fn, has_aux=True)(det_state.params)
        (den_loss, (den_stats, l1, l2)), den_grads = jax.value_and_grad(
            den_loss_fn, has_aux=True)(den_state.params)

        guard = cfg.train.skip_nonfinite_updates
        det_params, det_opt, det_stats, det_fin = guarded_update(
            tx_det, det_state, det_grads, det_stats, guard)
        den_params, den_opt, den_stats, den_fin = guarded_update(
            tx_den, den_state, den_grads, den_stats, guard)
        new_det = TrainState(det_params, det_stats, det_opt,
                             det_state.step + 1)
        new_den = TrainState(den_params, den_stats, den_opt,
                             den_state.step + 1)
        metrics = {"detector_loss": det_loss, "detector_accuracy": det_acc,
                   "denoiser_loss": den_loss, "stage1": l1, "stage2": l2,
                   "finite": (det_fin & den_fin).astype(jnp.float32)}
        return new_det, new_den, metrics

    return train_step
