"""Stage-2 joint denoiser: noise inpainting U-Net + context aggregation mask net.

Re-design of the reference `JointModel` (m2 networks.py:152-217):

* :class:`InpaintNet` — dual-encoder U-Net that "inpaints" the full noise
  spectrogram from (a) the silence-gated noise observation and (b) the
  mixed signal. Downsampling uses reflection-padded strided convs, the
  bottleneck stacks dilated convs (2/4/8/16), the decoder uses transposed
  convs with skip concatenations and nearest-resize shape fixups.
* :class:`ContextAggNet` — two dilated-conv encoders (mixed + predicted
  noise), a BiLSTM over time, and an MLP head with sigmoid producing the
  compressed complex ratio mask.
* :class:`JointDenoiser` — `noise_pred = inpaint(gated_noise, mixed)` then
  `mask = context(mixed, noise_pred)` (m2 networks.py:214-217).

Layout: NHWC (B, F, T, 2); the mask head reshapes its 512-wide output to
(B, F, T, 2) with the channel-major index rule of the reference's
`view(B, 2, 256, T)` (m2 networks.py:92).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from sos_tpu.config import DenoiserModelConfig
from sos_tpu.models.layers import ConvBlock, DownConvBlock, TorchLinear, UpConvBlock
from sos_tpu.ops.lstm import BiLSTM
from sos_tpu.ops.resize import (
    dynamic_nearest_time,
    nearest_resize_1d,
    nearest_resize_2d,
)


class InpaintNet(nn.Module):
    """Noise-spectrogram inpainting U-Net (m2 networks.py:152-205)."""

    channels: Tuple[int, int, int] = (64, 128, 256)
    compute_dtype: str = "float32"
    remat: bool = False

    @nn.compact
    def __call__(self, gated_noise: jnp.ndarray, mixed: jnp.ndarray,
                 train: bool = False, valid_t=None) -> jnp.ndarray:
        """With `valid_t` (traced scalar), runs the exact length-bucketed
        variant: every block re-zeroes its padded time tail and injects
        the end-boundary reflection at the dynamic valid boundary (see
        layers.DownConvBlock), so outputs on the valid region match the
        unpadded program exactly."""
        dtype = jnp.dtype(self.compute_dtype)
        gated_noise = gated_noise.astype(dtype)
        mixed = mixed.astype(dtype)
        ch1, ch2, ch3 = self.channels
        down_cls = nn.remat(DownConvBlock) if self.remat else DownConvBlock
        dc = lambda f, k, s, d=1, **kw: down_cls(
            features=f, kernel_size=k, stride=s, dilation=d, train=train, **kw)

        def call(block, x, v):
            if v is None:
                return block(x), None
            return block(x, valid_t=v)

        v0 = valid_t
        # Encoder A: silence-gated noise observation.
        down1, v = call(dc(ch1, 5, 1, name="a_in"), gated_noise, v0)
        x, v2 = call(dc(ch2, 5, 2, name="a_d1"), down1, v)
        down2, v2 = call(dc(ch2, 5, 1, name="a_d2"), x, v2)
        # Encoder B: mixed signal.
        down3, v3b = call(dc(ch1, 5, 1, name="b_in"), mixed, v0)
        x, v4 = call(dc(ch2, 5, 2, name="b_d1"), down3, v3b)
        down4, v4 = call(dc(ch2, 5, 1, name="b_d2"), x, v4)

        x = jnp.concatenate([down2, down4], axis=-1)
        x, vm = call(dc(ch3, 3, 2, name="mid0"), x, v4)
        x, vm = call(dc(ch3, 3, 1, name="mid1"), x, vm)
        x, vm = call(dc(ch3, 3, 1, 2, name="mid_dil2"), x, vm)
        x, vm = call(dc(ch3, 3, 1, 4, name="mid_dil4"), x, vm)
        x, vm = call(dc(ch3, 3, 1, 8, name="mid_dil8"), x, vm)
        x, vm = call(dc(ch3, 3, 1, 16, name="mid_dil16"), x, vm)
        x, vm = call(dc(ch3, 3, 1, name="mid2"), x, vm)
        x, vm = call(dc(ch3, 3, 1, name="mid3"), x, vm)
        # output_padding=1 replicates the reference's positional-arg quirk
        # (m2 networks.py:130 passes dilation into output_padding).
        x, vm = call(UpConvBlock(features=ch2, kernel_size=3, stride=2,
                                 output_padding=1, train=train,
                                 name="mid_up"), x, vm)

        if valid_t is None:
            if x.shape[1:3] != down4.shape[1:3]:
                x = nearest_resize_2d(x, down4.shape[1:3], h_axis=1, w_axis=2)
        else:
            # the exact program always resizes here (freq widths mismatch
            # statically); time resizes valid->valid via dynamic nearest
            x = nearest_resize_1d(x, down4.shape[1], axis=1)
            x = dynamic_nearest_time(x, vm, v4, down4.shape[2])
        x = jnp.concatenate([x, down4], axis=-1)
        x, vu = call(dc(ch2, 3, 1, name="up1_conv"), x, v4)
        x, vu = call(UpConvBlock(features=ch1, kernel_size=3, stride=2,
                                 output_padding=1, train=train,
                                 name="up1_up"), x, vu)

        if valid_t is None:
            if x.shape[1:3] != down3.shape[1:3]:
                x = nearest_resize_2d(x, down3.shape[1:3], h_axis=1, w_axis=2)
        else:
            x = nearest_resize_1d(x, down3.shape[1], axis=1)
            x = dynamic_nearest_time(x, vu, v3b, down3.shape[2])
        x = jnp.concatenate([x, down3], axis=-1)
        x, vf = call(dc(ch1, 3, 1, name="up2_conv"), x, v3b)
        x, vf = call(down_cls(features=2, kernel_size=3, stride=1, norm=None,
                              act=None, train=train, name="out"), x, vf)
        # (B, F, T, 2): predicted full-noise spectrogram (float32 out)
        return x.astype(jnp.float32)


class ContextAggNet(nn.Module):
    """Mask predictor over mixed + predicted-noise spectrograms (m2 networks.py:54-94)."""

    cfg: DenoiserModelConfig = DenoiserModelConfig()
    compute_dtype: str = "float32"
    remat: bool = False
    # bf16 LSTM input projection (see SilenceDetector.bf16_head_proj)
    bf16_head_proj: bool = False

    def _encoder(self, x, nf, outf, prefix, train, valid_t=None):
        cfg = self.cfg
        block_cls = nn.remat(ConvBlock) if self.remat else ConvBlock
        x = x.astype(jnp.dtype(self.compute_dtype))
        tmask = None
        if valid_t is not None:
            tmask = (jnp.arange(x.shape[2]) < valid_t).astype(x.dtype)[
                None, None, :, None]
            x = x * tmask
        for i, (ks, dil) in enumerate(zip(cfg.kernel_sizes, cfg.dilations)):
            x = block_cls(features=nf, kernel_size=ks, dilation=dil,
                          train=train, name=f"{prefix}{i}")(x)
            if tmask is not None:
                x = x * tmask  # keep SAME padding == unpadded program
        x = block_cls(features=outf, kernel_size=(1, 1), dilation=(1, 1),
                      train=train, name=f"{prefix}proj")(x)
        # channel-major flatten: (B, F, T, C) -> (B, T, C*F)
        b, f, t, c = x.shape
        out = jnp.transpose(x, (0, 2, 3, 1)).reshape(b, t, c * f)
        # BiLSTM + mask head run float32 (mask feeds the cRM inversion).
        return out.astype(jnp.float32)

    @nn.compact
    def __call__(self, mixed: jnp.ndarray, noise_pred: jnp.ndarray,
                 train: bool = False, valid_t=None) -> jnp.ndarray:
        cfg = self.cfg
        f_x = self._encoder(mixed, cfg.nf_mixed, cfg.outf_mixed, "enc_x",
                            train, valid_t)
        f_n = self._encoder(noise_pred, cfg.nf_noise, cfg.outf_noise,
                            "enc_n", train, valid_t)
        h = jnp.concatenate([f_x, f_n], axis=-1)  # (B, T, 12*F/4... = 3072)
        h = BiLSTM(hidden=cfg.lstm_hidden, name="lstm",
                   bf16_proj=self.bf16_head_proj)(
            h, valid_len=valid_t)  # (B, T, 400)
        h = nn.relu(TorchLinear(cfg.fc_hidden, name="fc0")(h))
        h = nn.relu(TorchLinear(cfg.fc_hidden, name="fc1")(h))
        h = nn.sigmoid(TorchLinear(cfg.freq_bins * 2, name="fc2")(h))
        # (B, T, 2*F) -> (B, F, T, 2), channel-major like view(B,2,F,T)
        b, t, _ = h.shape
        h = h.reshape(b, t, 2, cfg.freq_bins)
        return jnp.transpose(h, (0, 3, 1, 2))  # (B, F, T, 2)


class JointDenoiser(nn.Module):
    """InpaintNet -> ContextAggNet (m2 networks.py:208-217)."""

    cfg: DenoiserModelConfig = DenoiserModelConfig()
    compute_dtype: str = "float32"
    remat: bool = False
    # bf16 LSTM input projection (see SilenceDetector.bf16_head_proj)
    bf16_head_proj: bool = False

    def setup(self):
        self.inpaint = InpaintNet(channels=self.cfg.inpaint_ch,
                                  compute_dtype=self.compute_dtype,
                                  remat=self.remat)
        self.context = ContextAggNet(cfg=self.cfg,
                                     compute_dtype=self.compute_dtype,
                                     remat=self.remat,
                                     bf16_head_proj=self.bf16_head_proj)

    def __call__(self, mixed: jnp.ndarray, gated_noise: jnp.ndarray,
                 train: bool = False, valid_t=None):
        """Returns (noise_pred, compressed_crm), both (B, F, T, 2).

        `valid_t` (traced scalar) enables exact length-bucketed inference;
        outputs beyond valid_t are garbage and must be masked by callers.
        """
        noise_pred = self.inpaint(gated_noise, mixed, train=train,
                                  valid_t=valid_t)
        mask = self.context(mixed, noise_pred, train=train, valid_t=valid_t)
        return noise_pred, mask
