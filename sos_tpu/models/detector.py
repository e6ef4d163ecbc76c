"""Stage-1 silent-interval detector.

Re-design of the reference's `AudioVisualNet` (m1 networks.py:80-155; the
video branch there is dead code and is not reproduced): a stack of dilated
Conv2d blocks over the complex spectrogram, a 1x1 projection to 8
features, nearest resampling of the time axis onto the video-frame grid,
a BiLSTM over frames, and a 2-layer per-frame classifier emitting one
silence logit per video frame.

Input : (B, F=256, T, 2)  — STFT real/imag, NHWC
Output: (B, num_frames)   — logits; sigmoid>=0.5 means "voiced" (bit 1)
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from sos_tpu.config import DetectorModelConfig
from sos_tpu.models.layers import ConvBlock, TorchLinear
from sos_tpu.ops.lstm import BiLSTM
from sos_tpu.ops.resize import nearest_resize_1d


class SilenceDetector(nn.Module):
    cfg: DetectorModelConfig = DetectorModelConfig()

    compute_dtype: str = "float32"
    remat: bool = False  # per-block rematerialization (training memory)
    # bf16 LSTM input projection (ops/lstm.py BiLSTM.bf16_proj): the
    # hoisted (T*B, C*F) x (C*F, 4H) matmul rides the MXU at ~6x the
    # f32-HIGHEST rate; the recurrence stays exact f32. Default off —
    # the f32 profile and training keep reference-exact numerics; the
    # bf16/int8 serving profiles enable it (drift certified on trained
    # checkpoints, docs/EXPERIMENTS.md).
    bf16_head_proj: bool = False

    @nn.compact
    def __call__(
        self,
        spec: jnp.ndarray,
        num_frames: Optional[int] = None,
        train: bool = False,
        valid_t: Optional[jnp.ndarray] = None,
        valid_frames: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """spec: (B, F, T, 2). `valid_t`/`valid_frames` (traced scalars)
        enable exact length-bucketed inference: spectrogram frames >=
        valid_t are treated as nonexistent (re-zeroed after every conv so
        SAME padding behaves like the unpadded program), the nearest
        resample maps the `num_frames` grid onto [0, valid_t), and the
        BiLSTM masks steps >= valid_frames."""
        cfg = self.cfg
        out_frames = num_frames or cfg.num_frames
        block_cls = nn.remat(ConvBlock) if self.remat else ConvBlock
        # The conv trunk carries ~90% of the FLOPs; run it in the compute
        # dtype (bf16 doubles MXU throughput on v5e). The BiLSTM and the
        # classifier head stay float32 (recurrences are precision-fragile).
        x = spec.astype(jnp.dtype(self.compute_dtype))
        t_total = x.shape[2]
        tmask = None
        if valid_t is not None:
            tmask = (jnp.arange(t_total) < valid_t).astype(x.dtype)[
                None, None, :, None]
            x = x * tmask
        # Dilated conv trunk (kernels/dilations from m1 networks.py:91-93).
        for i, (ks, dil) in enumerate(zip(cfg.kernel_sizes, cfg.dilations)):
            x = block_cls(
                features=cfg.nf, kernel_size=ks, dilation=dil,
                train=train, name=f"conv{i}",
            )(x)
            if tmask is not None:
                # invalid frames become BN-bias garbage; re-zero so the
                # next SAME conv sees the unpadded program's zero padding
                x = x * tmask
        x = block_cls(
            features=cfg.outf, kernel_size=(1, 1), dilation=(1, 1),
            train=train, name="proj",
        )(x)  # (B, F, T, outf)

        # Flatten features channel-major (c*F + f) to match the reference's
        # NCHW view(B, C*F, T) (m1 networks.py:132), then resample time to
        # the video-frame grid with torch-nearest indices (networks.py:133).
        b, f, t, c = x.shape
        x = jnp.transpose(x, (0, 2, 3, 1)).reshape(b, t, c * f)  # (B, T, C*F)
        if valid_t is None:
            x = nearest_resize_1d(x, out_frames, axis=1)  # (B, frames, C*F)
        else:
            vf = valid_frames if valid_frames is not None else out_frames
            # floor(j * valid_t / vf) in exact integer arithmetic
            idx = (jnp.arange(out_frames, dtype=jnp.int32)
                   * jnp.asarray(valid_t, jnp.int32)) // jnp.asarray(vf, jnp.int32)
            idx = jnp.clip(idx, 0, t - 1)
            x = jnp.take(x, idx, axis=1)
        x = x.astype(jnp.float32)

        x = BiLSTM(hidden=cfg.lstm_hidden, name="lstm",
                   bf16_proj=self.bf16_head_proj)(
            x, valid_len=valid_frames)  # (B, frames, 2H)
        x = TorchLinear(cfg.fc_hidden, name="fc1")(x)
        x = nn.relu(x)
        x = TorchLinear(1, name="fc2")(x)
        return x[..., 0]  # (B, frames) logits
