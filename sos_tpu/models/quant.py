"""Int8 post-training quantization for the denoiser's conv trunks.

The ContextAggNet encoders + InpaintNet are ~95% of denoising inference
FLOPs (m2 networks.py:61-80,152-205 — dilated 5x5 conv blocks at 96/64
channels over a 256x178 spectrogram plus a U-Net). Measured on v5e, XLA's
int8 conv path runs the 96-channel blocks at effectively the full 394-TOPS
MXU peak (including its internal per-tap lane padding), ~2x bf16 — so the
int8 profile quantizes the conv trunks and keeps the precision-sensitive
LSTM/FC mask head float32.

Scheme (int8-RESIDENT activations, v2):

* BatchNorm folds into the conv (inference-only affine), giving per-block
  folded float (kernel, bias);
* every quantized block CONSUMES int8 and EMITS int8: the requantize step
  (dequant + bias + ReLU/PReLU + quant) is a pure elementwise epilogue XLA
  fuses into the conv, so only int8 tensors cross HBM between blocks.
  Measured motivation: the InpaintNet's full-resolution junctions
  (resize + skip-concat + quantize) moved multi-GB float32 activations —
  int8-early junctions cut the up1 junction cost ~40% on v5e;
* per-input-channel scale folding: a block whose input is a CONCAT of two
  producers with different activation scales folds the per-channel scale
  vector into the float kernel BEFORE weight quantization
  (w_eff[..,c,:] = w_f[..,c,:] * s_in[c]), so mixed-scale concats need no
  runtime rescaling pass;
* weights: symmetric per-OUTPUT-CHANNEL int8 over the folded kernel
  (scale = max|w_eff_c| / 127);
* activations: symmetric per-TENSOR int8 with STATIC scales calibrated
  offline (max|out| over calibration batches * margin / 127) — static
  scales keep every epilogue shape-free of reductions;
* ReLU/PReLU commute with the positive requant scaling
  (prelu(k*x) = k*prelu(x) for k>0), so the epilogue folds 1/s_out into
  the dequant scale and bias — one fused multiply-add-act-round chain;
* accumulation is int32 on the MXU;
* the BiLSTM/FC mask head and the InpaintNet output head stay float32.

Quality is certified per-checkpoint by measurement, not assumption: see
tests/test_quant.py (mask drift bound vs f32) and bench.py (reports f32 /
bf16 / int8 profiles side by side).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sos_tpu.config import DenoiserModelConfig
from sos_tpu.models.denoiser import InpaintNet
from sos_tpu.ops.lstm import BiLSTM
from sos_tpu.models.layers import TorchLinear

_BN_EPS = 1e-5  # TorchBatchNorm (layers.py): torch defaults


def fold_conv_bn(kernel: np.ndarray, scale: np.ndarray, bias: np.ndarray,
                 mean: np.ndarray, var: np.ndarray,
                 eps: float = _BN_EPS) -> Tuple[np.ndarray, np.ndarray]:
    """Fold inference BatchNorm into the preceding conv.

    y = scale * (conv(x, w) - mean) / sqrt(var + eps) + bias
      = conv(x, w * g) + (bias - mean * g),  g = scale / sqrt(var + eps)
    """
    g = np.asarray(scale) / np.sqrt(np.asarray(var) + eps)
    return (np.asarray(kernel) * g[None, None, None, :],
            np.asarray(bias) - np.asarray(mean) * g)


def quantize_weight(kernel: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric per-output-channel int8: returns (w_q, scale[Cout])."""
    amax = np.max(np.abs(kernel), axis=(0, 1, 2))
    scale = np.maximum(amax, 1e-12) / 127.0
    w_q = np.clip(np.round(kernel / scale[None, None, None, :]),
                  -127, 127).astype(np.int8)
    return w_q, scale.astype(np.float32)


def _quantize_weight_folded(w_f: np.ndarray, s_in) -> Tuple[np.ndarray,
                                                            np.ndarray]:
    """Quantize with the input activation scale(s) folded into the kernel.

    s_in: scalar, or per-input-channel vector (Cin,) for concat inputs.
    Reconstruction: conv(x_q, w_q) * w_s ~= conv(x_q * s_in, w_f).
    """
    s_vec = np.broadcast_to(np.asarray(s_in, np.float64), (w_f.shape[2],))
    w_eff = np.asarray(w_f, np.float64) * s_vec[None, None, :, None]
    return quantize_weight(w_eff.astype(np.float32))


def _block_tree(params: Dict, stats: Dict, name: str):
    p = params[name]
    bn = p["TorchBatchNorm_0"]["BatchNorm_0"]
    s = stats[name]["TorchBatchNorm_0"]["BatchNorm_0"]
    return (np.asarray(p["Conv_0"]["kernel"]), np.asarray(bn["scale"]),
            np.asarray(bn["bias"]), np.asarray(s["mean"]),
            np.asarray(s["var"]))


def _quantize_act(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    return jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)


class QuantEncoderParams:
    """Folded parameters for one encoder stack (float until `finalize`)."""

    def __init__(self, params: Dict, stats: Dict, prefix: str,
                 n_blocks: int, proj_name: str = None):
        self.blocks_f: List[Tuple[np.ndarray, np.ndarray]] = []
        names = [f"{prefix}{i}" for i in range(n_blocks)] + \
            [proj_name or f"{prefix}proj"]
        for name in names:
            w_f, b_f = fold_conv_bn(*_block_tree(params, stats, name))
            self.blocks_f.append((w_f, b_f.astype(np.float32)))
        # act_scales[i] = input scale of block i (== output scale of
        # block i-1); filled by calibration, consumed by finalize().
        self.act_scales: List[float] = [1.0] * len(names)
        # finalized: (w_q, dequant_scale, bias, requant) per block
        self.blocks: List[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                bool]] = []

    def finalize(self) -> None:
        self.blocks = []
        n = len(self.blocks_f)
        for i, (w_f, b_f) in enumerate(self.blocks_f):
            w_q, w_s = _quantize_weight_folded(w_f, self.act_scales[i])
            requant = i + 1 < n
            if requant:
                s_out = self.act_scales[i + 1]
                w_s, b_f = w_s / s_out, b_f / s_out
            self.blocks.append((jnp.asarray(w_q), jnp.asarray(w_s),
                                jnp.asarray(b_f.astype(np.float32)), requant))


def _conv_same(x: jnp.ndarray, w: jnp.ndarray, dilation: Tuple[int, int],
               ks: Tuple[int, int], acc_dtype,
               lhs_spec: str = "NHWC") -> jnp.ndarray:
    kf, kt = ks
    df, dt = dilation
    pad = ((kf - 1) // 2 * df, (kt - 1) // 2 * dt)
    return jax.lax.conv_general_dilated(
        x, w, (1, 1),
        ((pad[0], pad[0]), (pad[1], pad[1])),
        rhs_dilation=(df, dt),
        dimension_numbers=(lhs_spec, "HWIO", "NHWC"),
        preferred_element_type=acc_dtype)


def _run_encoder_int8(enc: "QuantEncoderParams", specs, x: jnp.ndarray,
                      packed: bool = False, valid_t=None,
                      time_take=None) -> jnp.ndarray:
    """Int8-resident conv-trunk runner (ContextAggNet encoders + detector
    trunk). `packed=True`: x is (B, 2, F, T); the first conv consumes it
    via an NCHW lhs spec. Returns float32 NHWC activations of the proj
    block (the only f32 tensor: it feeds the float head).

    `time_take` (static int indices): subset the time axis on the INT8
    tensor right before the final (1x1 proj) block. A 1x1 conv commutes
    with time subsetting, so for the detector this is bit-identical to
    resampling after the proj/flatten — while running proj on 60 frames
    instead of 178 and never materializing the full-width f32 features.

    `valid_t` (traced scalar; NHWC only): exact length-bucketed variant —
    the time tail >= valid_t is re-zeroed after every requant exactly as
    the float encoders re-zero after every block (models/denoiser.py
    _encoder), so SAME padding behaves like the unpadded program. Int8
    zero IS real zero (symmetric quantization), so the masking is exact."""
    assert enc.blocks, "finalize() must run before the first forward"
    assert valid_t is None or not packed, "valid_t requires NHWC layout"
    assert time_take is None or valid_t is None, \
        "time_take is a fixed-shape fast path"
    tmask = None
    x = x.astype(jnp.float32)
    if valid_t is not None:
        tmask = (jnp.arange(x.shape[2]) < valid_t)[None, None, :, None]
        x = x * tmask.astype(x.dtype)
    h_q = _quantize_act(x, enc.act_scales[0])
    h = None
    last = len(enc.blocks) - 1
    for i, ((w_q, w_s, b, requant), (ks, dil)) in enumerate(
            zip(enc.blocks, specs)):
        if i == last and time_take is not None:
            assert ks == (1, 1), "time_take requires a 1x1 final block"
            h_q = jnp.take(h_q, jnp.asarray(time_take), axis=2)
        lhs = "NCHW" if (packed and i == 0) else "NHWC"
        acc = _conv_same(h_q, w_q, dil, ks, jnp.int32, lhs_spec=lhs)
        y = jnp.maximum(
            acc.astype(jnp.float32) * w_s[None, None, None, :] + b, 0.0)
        if requant:
            # epilogue quant: 1/s_out already folded into w_s and b
            h_q = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)
            if tmask is not None:
                h_q = h_q * tmask.astype(jnp.int8)
        else:
            h = y if tmask is None else y * tmask.astype(y.dtype)
    return h


def _run_encoder_float_maxes(enc: "QuantEncoderParams", specs,
                             x: jnp.ndarray, packed: bool = False
                             ) -> List[float]:
    """Folded-float pass recording per-block input maxima (calibration)."""
    maxes = []
    x = x.astype(jnp.float32)
    for i, ((w_f, b_f), (ks, dil)) in enumerate(zip(enc.blocks_f, specs)):
        maxes.append(float(jnp.max(jnp.abs(x))))
        lhs = "NCHW" if (packed and i == 0) else "NHWC"
        y = _conv_same(x, jnp.asarray(w_f), dil, ks, jnp.float32,
                       lhs_spec=lhs) + jnp.asarray(b_f)
        x = jnp.maximum(y, 0.0)
    return maxes


class QuantInpaintParams:
    """Folded + quantized InpaintNet blocks, keyed by block name.

    Block geometry mirrors models/denoiser.py InpaintNet (incl. the
    reference's output_padding=1 ConvTranspose quirk and the nearest
    interpolate fix-ups). The final `out` block stays float32 (tiny,
    64->2; it produces the noise_pred output directly) with its int8
    input's dequant scale folded into the kernel.
    """

    # (name, kind, kernel, stride, dilation) in forward order
    SPEC = [
        ("a_in", "down", 5, 1, 1), ("a_d1", "down", 5, 2, 1),
        ("a_d2", "down", 5, 1, 1),
        ("b_in", "down", 5, 1, 1), ("b_d1", "down", 5, 2, 1),
        ("b_d2", "down", 5, 1, 1),
        ("mid0", "down", 3, 2, 1), ("mid1", "down", 3, 1, 1),
        ("mid_dil2", "down", 3, 1, 2), ("mid_dil4", "down", 3, 1, 4),
        ("mid_dil8", "down", 3, 1, 8), ("mid_dil16", "down", 3, 1, 16),
        ("mid2", "down", 3, 1, 1), ("mid3", "down", 3, 1, 1),
        ("mid_up", "up", 3, 2, 1),
        ("up1_conv", "down", 3, 1, 1), ("up1_up", "up", 3, 2, 1),
        ("up2_conv", "down", 3, 1, 1),
    ]

    # Per-block input-scale composition (models/denoiser.py dataflow).
    # A list means the input is a channel-concat of those producers'
    # outputs in order, equal channel widths; "__gated__"/"__mixed__"
    # are the two network inputs.
    SCALE_SOURCES = {
        "a_in": ["__gated__"], "a_d1": ["a_in"], "a_d2": ["a_d1"],
        "b_in": ["__mixed__"], "b_d1": ["b_in"], "b_d2": ["b_d1"],
        "mid0": ["a_d2", "b_d2"], "mid1": ["mid0"],
        "mid_dil2": ["mid1"], "mid_dil4": ["mid_dil2"],
        "mid_dil8": ["mid_dil4"], "mid_dil16": ["mid_dil8"],
        "mid2": ["mid_dil16"], "mid3": ["mid2"], "mid_up": ["mid3"],
        "up1_conv": ["mid_up", "b_d2"], "up1_up": ["up1_conv"],
        "up2_conv": ["up1_up", "b_in"],
    }

    def __init__(self, params: Dict, stats: Dict):
        self.blocks_f: Dict[str, tuple] = {}
        for name, kind, k, s, d in self.SPEC:
            p = params[name]
            bn = p["TorchBatchNorm_0"]["BatchNorm_0"]
            st = stats[name]["TorchBatchNorm_0"]["BatchNorm_0"]
            kernel = np.asarray(p["Conv_0"]["kernel"] if kind == "down"
                                else p["kernel"])
            w_f, b_f = fold_conv_bn(kernel, np.asarray(bn["scale"]),
                                    np.asarray(bn["bias"]),
                                    np.asarray(st["mean"]),
                                    np.asarray(st["var"]))
            alpha = float(np.asarray(p["act"]["alpha"]))
            self.blocks_f[name] = (w_f, b_f.astype(np.float32), alpha)
        self.out_kernel_f = np.asarray(params["out"]["Conv_0"]["kernel"])
        self.out_bias = jnp.asarray(params["out"]["Conv_0"]["bias"])
        # out_scales[name] = activation scale of that block's OUTPUT;
        # plus "__gated__"/"__mixed__" input scales. Set by calibration.
        self.out_scales: Dict[str, float] = {}
        self.blocks: Dict[str, tuple] = {}
        self.out_kernel: Optional[jnp.ndarray] = None

    # Concat inputs whose producer scales differ by more than this factor
    # get their smaller-scale half's weights quantized against a max
    # dominated by the other half — surfaced at finalize() so pathological
    # checkpoints are visible (quality is certified per-checkpoint by
    # measurement; see tests/test_quant.py).
    CONCAT_SCALE_RATIO_WARN = 16.0

    def finalize(self) -> None:
        self.blocks = {}
        for name, kind, k, s, d in self.SPEC:
            w_f, b_f, alpha = self.blocks_f[name]
            sources = self.SCALE_SOURCES[name]
            cin = w_f.shape[2]
            assert cin % len(sources) == 0, (name, cin, sources)
            per = cin // len(sources)
            src_scales = [self.out_scales[src] for src in sources]
            if len(src_scales) > 1:
                ratio = max(src_scales) / max(min(src_scales), 1e-30)
                if ratio > self.CONCAT_SCALE_RATIO_WARN:
                    import logging

                    logging.getLogger(__name__).warning(
                        "int8 concat block %r: producer activation scales "
                        "differ by %.1fx (%s) — the smaller-scale half's "
                        "weights lose int8 resolution; verify mask drift "
                        "for this checkpoint", name, ratio,
                        dict(zip(sources, src_scales)))
            s_in = np.repeat(np.asarray(src_scales, np.float64), per)
            w_q, w_s = _quantize_weight_folded(w_f, s_in)
            s_out = self.out_scales[name]
            self.blocks[name] = (jnp.asarray(w_q),
                                 jnp.asarray(w_s / s_out),
                                 jnp.asarray((b_f / s_out)
                                             .astype(np.float32)),
                                 alpha)
        # float output head: fold the int8 input's dequant scale in
        self.out_kernel = jnp.asarray(
            (self.out_kernel_f * self.out_scales["up2_conv"])
            .astype(np.float32))


_INPAINT_BY_NAME = {name: (kind, k, st, d)
                    for name, kind, k, st, d in QuantInpaintParams.SPEC}


class QuantizedDenoiser:
    """JointDenoiser with int8 ContextAggNet conv trunks.

    Same call contract as `JointDenoiser.apply(variables, mixed, gated,
    train=False)` -> (noise_pred, compressed_crm); InpaintNet runs in
    `inpaint_dtype` (default int8; "bfloat16" keeps it float — its own
    drift is bounded by tests/test_reference_parity.py), the LSTM/FC mask
    head in float32 except the hoisted LSTM input projection, which runs
    in bfloat16 by default (`bf16_head_proj`): measured +2.8% denoiser /
    +2.9% two-stage at batch 256 with crm drift 9.4e-6 — five orders
    under the int8 profile's own 5e-3 bound
    (experiments/bf16_lstm_proj.py). Pass bf16_head_proj=False for the
    exact-f32 head.

    `calibrate()` must run before the first forward (static activation
    scales); it records per-block output maxima over calibration batches
    then finalizes the folded int8 weights.
    """

    def __init__(self, cfg: DenoiserModelConfig, variables: Dict,
                 inpaint_dtype: str = "int8",
                 calibration_margin: float = 1.1,
                 bf16_head_proj: bool = True):
        self.cfg = cfg
        self.bf16_head_proj = bf16_head_proj
        params = variables["params"]["context"]
        stats = variables["batch_stats"]["context"]
        n = len(cfg.kernel_sizes)
        self.enc_x = QuantEncoderParams(params, stats, "enc_x", n)
        self.enc_n = QuantEncoderParams(params, stats, "enc_n", n)
        self.head_params = {
            "lstm": params["lstm"], "fc0": params["fc0"],
            "fc1": params["fc1"], "fc2": params["fc2"]}
        self.inpaint_mode = inpaint_dtype
        self.inpaint = InpaintNet(
            channels=cfg.inpaint_ch,
            compute_dtype=inpaint_dtype if inpaint_dtype != "int8"
            else "bfloat16")
        self.inpaint_vars = {
            "params": variables["params"]["inpaint"],
            "batch_stats": variables["batch_stats"]["inpaint"]}
        self.qinpaint = QuantInpaintParams(
            variables["params"]["inpaint"],
            variables["batch_stats"]["inpaint"]) if inpaint_dtype == "int8" \
            else None
        self.margin = calibration_margin
        self._calibrated = False
        self._packed = False  # set transiently by the packed entry points

    # -- InpaintNet (quantized) ------------------------------------------

    def _inpaint_geometry(self, gated, mixed, blk, valid_t=None):
        """The InpaintNet dataflow with pluggable per-block op `blk` —
        written once so the int8 pass and the float calibration pass can
        never diverge geometrically (models/denoiser.py InpaintNet).
        For the int8 pass, `gated`/`mixed` arrive PRE-QUANTIZED int8 and
        every block emits int8 (int8-resident activations).

        `valid_t` (traced scalar; int8 pass only): the exact
        length-bucketed variant — `blk(name, x, v)` must return
        (y, v_out) and the junction resizes map valid->valid with the
        dynamic nearest rule, mirroring models/denoiser.py InpaintNet's
        valid chain exactly."""
        from sos_tpu.ops.resize import (dynamic_nearest_time,
                                        nearest_resize_1d, nearest_resize_2d)

        def call(nm, x, v):
            if valid_t is None:
                return blk(nm, x), None
            return blk(nm, x, v)

        d1, v = call("a_in", gated, valid_t)
        x, v2 = call("a_d1", d1, v)
        d2, v2 = call("a_d2", x, v2)
        d3, v3b = call("b_in", mixed, valid_t)
        x, v4 = call("b_d1", d3, v3b)
        d4, v4 = call("b_d2", x, v4)
        x = jnp.concatenate([d2, d4], axis=-1)
        vm = v4
        for nm in ("mid0", "mid1", "mid_dil2", "mid_dil4", "mid_dil8",
                   "mid_dil16", "mid2", "mid3", "mid_up"):
            x, vm = call(nm, x, vm)
        if valid_t is None:
            if x.shape[1:3] != d4.shape[1:3]:
                x = nearest_resize_2d(x, d4.shape[1:3], h_axis=1, w_axis=2)
        else:
            x = nearest_resize_1d(x, d4.shape[1], axis=1)
            x = dynamic_nearest_time(x, vm, v4, d4.shape[2])
        x = jnp.concatenate([x, d4], axis=-1)
        x, vu = call("up1_conv", x, v4)
        x, vu = call("up1_up", x, vu)
        if valid_t is None:
            if x.shape[1:3] != d3.shape[1:3]:
                x = nearest_resize_2d(x, d3.shape[1:3], h_axis=1, w_axis=2)
        else:
            x = nearest_resize_1d(x, d3.shape[1], axis=1)
            x = dynamic_nearest_time(x, vu, v3b, d3.shape[2])
        x = jnp.concatenate([x, d3], axis=-1)
        x, vf = call("up2_conv", x, v3b)
        # pad in the narrow dtype (int8 for the quantized pass), convert
        # at the conv input where XLA fuses it
        if valid_t is None:
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                         mode="reflect")
        else:
            from sos_tpu.models.layers import reflect_time_tail, \
                zero_time_tail

            x = zero_time_tail(x, vf)
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 0), (0, 0)),
                         mode="reflect")
            xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 1), (0, 0)))
            xp = reflect_time_tail(xp, vf, 1, offset=1)
        xp = xp.astype(jnp.float32)
        out_spec = "NCHW" if self._packed else "NHWC"
        # float head; for the int8 pass the input dequant scale is folded
        # into out_kernel by finalize()
        kernel = (self.qinpaint.out_kernel if x.dtype == jnp.int8
                  else jnp.asarray(self.qinpaint.out_kernel_f))
        y = jax.lax.conv_general_dilated(
            xp, kernel, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", out_spec),
            preferred_element_type=jnp.float32)
        bias = self.qinpaint.out_bias
        y = y + (bias[None, :, None, None] if self._packed else bias)
        if valid_t is not None:
            y = zero_time_tail(y, vf)  # k=3,p=1,s=1: valid_out == vf
        return y

    @staticmethod
    def _up_pads(k: int) -> Tuple[int, int]:
        p = (k - 1) // 2
        pad_amt = k - 1 - p
        return pad_amt, pad_amt + 1  # output_padding=1 (reference quirk)

    def _inpaint_block_int8(self, name: str, x_q: jnp.ndarray, v=None):
        """Consumes int8 (producer-scaled), emits int8 (own out scale).

        With `v` (traced valid width): the exact length-bucketed variant —
        tail zeroing + dynamic-boundary reflection mirror
        layers.DownConvBlock/UpConvBlock's valid paths on the int8
        tensors (int8 zero is exact zero; reflection copies values), and
        the propagated valid width is returned: (y_q, v_out)."""
        qp = self.qinpaint
        kind, k, s, d = _INPAINT_BY_NAME[name]
        w_q, w_s, b, alpha = qp.blocks[name]
        packed_in = self._packed and name in ("a_in", "b_in")
        assert v is None or not packed_in, "valid_t requires NHWC layout"
        if kind == "down":
            pad = (k - 1) // 2 * d
            if v is None:
                spatial = ((2, 3) if packed_in else (1, 2))
                pads = [(0, 0)] * 4
                for ax in spatial:
                    pads[ax] = (pad, pad)
                x_q = jnp.pad(x_q, pads, mode="reflect")
            else:
                from sos_tpu.models.layers import reflect_time_tail, \
                    zero_time_tail

                x_q = zero_time_tail(x_q, v)
                x_q = jnp.pad(x_q, ((0, 0), (pad, pad), (pad, 0), (0, 0)),
                              mode="reflect")
                x_q = jnp.pad(x_q, ((0, 0), (0, 0), (0, pad), (0, 0)))
                x_q = reflect_time_tail(x_q, v, pad, offset=pad)
            acc = jax.lax.conv_general_dilated(
                x_q, w_q, (s, s), "VALID", rhs_dilation=(d, d),
                dimension_numbers=("NCHW" if packed_in else "NHWC",
                                   "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            v_out = None if v is None else \
                (v + 2 * pad - (d * (k - 1) + 1)) // s + 1
        else:  # transposed conv: lhs-dilated conv with flipped kernel
            if v is not None:
                from sos_tpu.models.layers import zero_time_tail

                # zeroed tail contributes nothing to the transposed conv
                x_q = zero_time_tail(x_q, v)
            lo, hi = self._up_pads(k)
            acc = jax.lax.conv_general_dilated(
                x_q, w_q[::-1, ::-1], (1, 1), ((lo, hi), (lo, hi)),
                lhs_dilation=(s, s),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            # output_padding=1 quirk: valid_out = (v-1)*s - 2p + k + 1
            v_out = None if v is None else \
                (v - 1) * s - 2 * ((k - 1) // 2) + k + 1
        # fused epilogue: dequant+bias (1/s_out pre-folded), PReLU, requant
        y = acc.astype(jnp.float32) * w_s + b
        y = jnp.where(y >= 0, y, alpha * y)
        y_q = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)
        if v is None:
            return y_q
        from sos_tpu.models.layers import zero_time_tail

        return zero_time_tail(y_q, v_out), v_out

    def _inpaint_block_float(self, name: str, x: jnp.ndarray,
                             record: Dict) -> jnp.ndarray:
        """Folded-float block recording OUTPUT maxima (calibration)."""
        qp = self.qinpaint
        kind, k, s, d = _INPAINT_BY_NAME[name]
        w_f, b, alpha = qp.blocks_f[name]
        w_f = jnp.asarray(w_f)
        x = x.astype(jnp.float32)
        packed_in = self._packed and name in ("a_in", "b_in")
        if kind == "down":
            pad = (k - 1) // 2 * d
            spatial = ((2, 3) if packed_in else (1, 2))
            pads = [(0, 0)] * 4
            for ax in spatial:
                pads[ax] = (pad, pad)
            xp = jnp.pad(x, pads, mode="reflect")
            y = jax.lax.conv_general_dilated(
                xp, w_f, (s, s), "VALID", rhs_dilation=(d, d),
                dimension_numbers=("NCHW" if packed_in else "NHWC",
                                   "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
        else:
            lo, hi = self._up_pads(k)
            y = jax.lax.conv_general_dilated(
                x, w_f[::-1, ::-1], (1, 1), ((lo, hi), (lo, hi)),
                lhs_dilation=(s, s),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
        y = y + jnp.asarray(b)
        y = jnp.where(y >= 0, y, alpha * y)
        record[name] = max(record.get(name, 0.0), float(jnp.max(jnp.abs(y))))
        return y

    def _inpaint_int8(self, gated, mixed, valid_t=None) -> jnp.ndarray:
        qp = self.qinpaint
        gated = gated.astype(jnp.float32)
        mixed = mixed.astype(jnp.float32)
        if valid_t is not None:
            from sos_tpu.models.layers import zero_time_tail

            gated = zero_time_tail(gated, valid_t)
            mixed = zero_time_tail(mixed, valid_t)
        gated_q = _quantize_act(gated, qp.out_scales["__gated__"])
        mixed_q = _quantize_act(mixed, qp.out_scales["__mixed__"])
        return self._inpaint_geometry(gated_q, mixed_q,
                                      self._inpaint_block_int8,
                                      valid_t=valid_t)

    # -- packed serving entry ---------------------------------------------

    def crm_packed(self, mixed_re, mixed_im, gated_re, gated_im
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Layout-friendly serving entry: spectra as (re, im) pairs of
        (B, T, F) (see dsp.stft.stft_packed). Returns the compressed cRM
        as (crm_re, crm_im), same (B, T, F) packing. Avoids every
        (..., 2)-trailing-dim tensor (which pads 2 -> 128 lanes).

        Calibration scales are layout-invariant, so a `calibrate()` run
        with NHWC batches serves this entry too.
        """
        assert self._calibrated, "call calibrate() before the first forward"
        assert self.inpaint_mode == "int8", "packed entry requires int8 mode"
        cfg = self.cfg

        def pack(re, im):  # (B,T,F) -> (B,2,F,T)
            return jnp.swapaxes(jnp.stack([re, im], axis=1), -1, -2)

        mixed_p = pack(mixed_re, mixed_im)
        gated_p = pack(gated_re, gated_im)
        self._packed = True
        try:
            noise_p = self._inpaint_int8(gated_p, mixed_p)
            f_x = self._encoder_int8(self.enc_x, mixed_p, packed=True)
            f_n = self._encoder_int8(self.enc_n, noise_p, packed=True)
        finally:
            self._packed = False
        h = self._head(f_x, f_n)  # (B, T, 2*F)
        bsz, t, _ = h.shape
        h = h.reshape(bsz, t, 2, cfg.freq_bins)
        return h[:, :, 0, :], h[:, :, 1, :]

    def _run_inpaint(self, gated, mixed, valid_t=None) -> jnp.ndarray:
        if self.inpaint_mode == "int8":
            return self._inpaint_int8(gated, mixed, valid_t)
        return self.inpaint.apply(self.inpaint_vars, gated, mixed,
                                  train=False, valid_t=valid_t)

    # -- calibration ---------------------------------------------------

    def _float_encoder_maxes(self, enc: QuantEncoderParams, x: jnp.ndarray,
                             packed: bool = False) -> List[float]:
        specs = list(zip(self.cfg.kernel_sizes, self.cfg.dilations)) \
            + [((1, 1), (1, 1))]
        return _run_encoder_float_maxes(enc, specs, x, packed)

    def calibrate(self, sample_batches: List[Tuple[jnp.ndarray, jnp.ndarray]]
                  ) -> None:
        """sample_batches: [(mixed_stft, gated_stft)] representative data."""
        maxes_x = None
        maxes_n = None
        inpaint_rec: Dict[str, float] = {}
        for mixed, gated in sample_batches:
            if self.inpaint_mode == "int8":
                inpaint_rec["__gated__"] = max(
                    inpaint_rec.get("__gated__", 0.0),
                    float(jnp.max(jnp.abs(gated))))
                inpaint_rec["__mixed__"] = max(
                    inpaint_rec.get("__mixed__", 0.0),
                    float(jnp.max(jnp.abs(mixed))))
                noise_pred = self._inpaint_geometry(
                    gated, mixed,
                    lambda nm, x: self._inpaint_block_float(nm, x,
                                                            inpaint_rec))
            else:
                noise_pred = self.inpaint.apply(self.inpaint_vars, gated,
                                                mixed, train=False)
            mx = self._float_encoder_maxes(self.enc_x, mixed)
            mn = self._float_encoder_maxes(self.enc_n, noise_pred)
            maxes_x = mx if maxes_x is None else [max(a, b) for a, b
                                                  in zip(maxes_x, mx)]
            maxes_n = mn if maxes_n is None else [max(a, b) for a, b
                                                  in zip(maxes_n, mn)]
        to_scale = lambda m: m * self.margin / 127.0 + 1e-12
        self.enc_x.act_scales = [to_scale(m) for m in maxes_x]
        self.enc_n.act_scales = [to_scale(m) for m in maxes_n]
        self.enc_x.finalize()
        self.enc_n.finalize()
        if self.inpaint_mode == "int8":
            self.qinpaint.out_scales = {name: to_scale(m)
                                        for name, m in inpaint_rec.items()}
            self.qinpaint.finalize()
        self._calibrated = True

    # -- calibration persistence ----------------------------------------

    def calibration_state(self) -> Dict:
        """The calibrated activation scales as a JSON-serializable dict —
        the full quantization state beyond the float checkpoint. Persist
        alongside the checkpoint so serving processes skip the
        calibration pass (and all serve IDENTICAL scales)."""
        assert self._calibrated
        state = {"enc_x": list(self.enc_x.act_scales),
                 "enc_n": list(self.enc_n.act_scales)}
        if self.inpaint_mode == "int8":
            state["inpaint"] = dict(self.qinpaint.out_scales)
        return state

    def load_calibration(self, state: Dict) -> None:
        self.enc_x.act_scales = [float(s) for s in state["enc_x"]]
        self.enc_n.act_scales = [float(s) for s in state["enc_n"]]
        self.enc_x.finalize()
        self.enc_n.finalize()
        if self.inpaint_mode == "int8":
            self.qinpaint.out_scales = {k: float(v)
                                        for k, v in state["inpaint"].items()}
            self.qinpaint.finalize()
        self._calibrated = True

    # -- forward ---------------------------------------------------------

    def _encoder_int8(self, enc: QuantEncoderParams, x: jnp.ndarray,
                      packed: bool = False, valid_t=None) -> jnp.ndarray:
        """`packed=True`: x is (B, 2, F, T) — the layout-friendly spectrum
        packing (the (F, T, 2) layout pads its 2-wide trailing dim to 128
        lanes). Only the first conv consumes it (NCHW lhs spec)."""
        specs = list(zip(self.cfg.kernel_sizes, self.cfg.dilations)) \
            + [((1, 1), (1, 1))]
        h = _run_encoder_int8(enc, specs, x, packed, valid_t=valid_t)
        bsz, f, t, c = h.shape
        return jnp.transpose(h, (0, 2, 3, 1)).reshape(bsz, t, c * f)

    def __call__(self, mixed: jnp.ndarray, gated_noise: jnp.ndarray,
                 valid_t=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """`valid_t` (traced scalar) enables exact length-bucketed
        inference like `JointDenoiser.apply(..., valid_t=...)`: outputs
        beyond valid_t are garbage and must be masked by callers."""
        assert self._calibrated, "call calibrate() before the first forward"
        cfg = self.cfg
        noise_pred = self._run_inpaint(gated_noise, mixed, valid_t)
        f_x = self._encoder_int8(self.enc_x, mixed, valid_t=valid_t)
        f_n = self._encoder_int8(self.enc_n, noise_pred, valid_t=valid_t)
        h = self._head(f_x, f_n, valid_t=valid_t)
        bsz, t, _ = h.shape
        h = h.reshape(bsz, t, 2, cfg.freq_bins)
        crm = jnp.transpose(h, (0, 3, 1, 2))
        return noise_pred, crm

    def _head(self, f_x: jnp.ndarray, f_n: jnp.ndarray,
              valid_t=None) -> jnp.ndarray:
        cfg = self.cfg
        h = jnp.concatenate([f_x, f_n], axis=-1)
        h = BiLSTM(hidden=cfg.lstm_hidden,
                   bf16_proj=self.bf16_head_proj).apply(
            {"params": self.head_params["lstm"]}, h, valid_len=valid_t)
        h = jax.nn.relu(TorchLinear(cfg.fc_hidden).apply(
            {"params": self.head_params["fc0"]}, h))
        h = jax.nn.relu(TorchLinear(cfg.fc_hidden).apply(
            {"params": self.head_params["fc1"]}, h))
        return jax.nn.sigmoid(TorchLinear(cfg.freq_bins * 2).apply(
            {"params": self.head_params["fc2"]}, h))


# The exception set load_calibration can raise on a wrong-schema scale
# mapping (AttributeError: a non-dict where a mapping belongs hits
# .items()). Every parser of the persisted calibration schema catches
# exactly this tuple — one definition so they can't drift apart.
CALIBRATION_SCHEMA_ERRORS = (AttributeError, IndexError, KeyError,
                             TypeError, ValueError)


def parse_calibration_file(path: str):
    """File-level parse of a persisted int8 activation-scale JSON (the
    schema FusedDenoisePipeline writes:
    {"denoiser": scales, "detector": scales}).

    Returns `(state, None)` on success or `(None, problem)` where
    `problem` is a one-line description ("not found", "unreadable (...)",
    "not a JSON object"). No logging — callers decide warn vs raise.
    The single parser shared by the fused pipeline and the standalone
    predictors, so they always agree on which files are valid."""
    import json
    import os

    if not os.path.exists(path):
        return None, "not found"
    try:
        with open(path) as fp:
            state = json.load(fp)
    except (OSError, ValueError) as exc:
        return None, f"unreadable ({exc})"
    if not isinstance(state, dict):
        return None, "not a JSON object"
    return state, None


def read_calibration_state(path: str, key: str) -> Optional[Dict]:
    """Parse a persisted calibration JSON and return its `key` sub-state,
    or None with a logged warning naming the file and the problem —
    shared by the standalone predictors so a corrupt/foreign file is
    never ignored silently."""
    import logging
    import os

    log = logging.getLogger(__name__)
    if not os.path.exists(path):
        return None  # absent is the normal first-run case: no warning
    state, problem = parse_calibration_file(path)
    if state is None:
        log.warning("calibration file %s: %s — self-calibrating instead",
                    path, problem)
        return None
    if key not in state:
        log.warning('calibration file %s: missing the "%s" key — '
                    "self-calibrating instead", path, key)
        return None
    return state[key]


def load_persisted_calibration(quant, path: str, key: str) -> bool:
    """Load `quant`'s activation scales from the persisted calibration
    JSON at `path` ({"denoiser": ..., "detector": ...} schema). False —
    with a logged warning — when the file is absent, unreadable, or
    carries the wrong scale schema; callers then self-calibrate. Only
    for not-yet-calibrated quant objects: a failed load can leave
    partial scales behind, harmless because `_calibrated` stays False
    and the subsequent self-calibration overwrites every scale."""
    import logging

    state = read_calibration_state(path, key)
    if state is None:
        return False
    try:
        quant.load_calibration(state)
        return True
    except CALIBRATION_SCHEMA_ERRORS as exc:
        logging.getLogger(__name__).warning(
            "calibration file %s: wrong scale schema (%s) — "
            "self-calibrating instead", path, exc)
        return False


class QuantizedDetector:
    """SilenceDetector with an int8 conv trunk (models/detector.py; the
    trunk is ~90% of detector FLOPs). BiLSTM + FC head stay float32
    except the hoisted LSTM input projection (bf16 by default, see
    QuantizedDenoiser — measured 0 decision flips, logit drift 6.9e-6).
    Same contract as `SilenceDetector.apply(vars, spec, num_frames,
    train=False)` -> (B, frames) logits; `logits_packed` consumes the
    packed (re, im) (B, T, F) spectra (see dsp.stft.stft_packed)."""

    def __init__(self, cfg, variables: Dict,
                 calibration_margin: float = 1.1,
                 bf16_head_proj: bool = True):
        self.cfg = cfg
        self.bf16_head_proj = bf16_head_proj
        params = variables["params"]
        stats = variables["batch_stats"]
        self.enc = QuantEncoderParams(params, stats, "conv",
                                      len(cfg.kernel_sizes),
                                      proj_name="proj")
        self.head_params = {"lstm": params["lstm"], "fc1": params["fc1"],
                            "fc2": params["fc2"]}
        self.margin = calibration_margin
        self._calibrated = False

    def _specs(self):
        return list(zip(self.cfg.kernel_sizes, self.cfg.dilations)) \
            + [((1, 1), (1, 1))]

    def calibrate(self, sample_specs: List[jnp.ndarray]) -> None:
        """sample_specs: [(B, F, T, 2) mixed spectrograms]."""
        maxes = None
        for spec in sample_specs:
            m = _run_encoder_float_maxes(self.enc, self._specs(), spec)
            maxes = m if maxes is None else [max(a, b)
                                             for a, b in zip(maxes, m)]
        self.enc.act_scales = [m * self.margin / 127.0 + 1e-12
                               for m in maxes]
        self.enc.finalize()
        self._calibrated = True

    def calibration_state(self) -> Dict:
        assert self._calibrated
        return {"conv": list(self.enc.act_scales)}

    def load_calibration(self, state: Dict) -> None:
        self.enc.act_scales = [float(s) for s in state["conv"]]
        self.enc.finalize()
        self._calibrated = True

    def _head(self, x: jnp.ndarray, num_frames: int, valid_t=None,
              valid_frames=None, pre_resampled: bool = False) -> jnp.ndarray:
        from sos_tpu.ops.resize import nearest_resize_1d

        cfg = self.cfg
        bsz, f, t, c = x.shape
        x = jnp.transpose(x, (0, 2, 3, 1)).reshape(bsz, t, c * f)
        if pre_resampled:
            assert t == num_frames
        elif valid_t is None:
            x = nearest_resize_1d(x, num_frames, axis=1)
        else:
            # exact dynamic nearest resample onto [0, valid_t) — same
            # integer floor rule as models/detector.py:84-89
            vf = valid_frames if valid_frames is not None else num_frames
            idx = (jnp.arange(num_frames, dtype=jnp.int32)
                   * jnp.asarray(valid_t, jnp.int32)) // jnp.asarray(
                       vf, jnp.int32)
            x = jnp.take(x, jnp.clip(idx, 0, t - 1), axis=1)
        x = x.astype(jnp.float32)
        x = BiLSTM(hidden=cfg.lstm_hidden,
                   bf16_proj=self.bf16_head_proj).apply(
            {"params": self.head_params["lstm"]}, x,
            valid_len=valid_frames)
        x = jax.nn.relu(TorchLinear(cfg.fc_hidden).apply(
            {"params": self.head_params["fc1"]}, x))
        x = TorchLinear(1).apply({"params": self.head_params["fc2"]}, x)
        return x[..., 0]

    def _time_take(self, t_in: int, num_frames: int):
        from sos_tpu.ops.resize import _nearest_indices

        return _nearest_indices(t_in, num_frames)

    def __call__(self, spec: jnp.ndarray, num_frames: int, valid_t=None,
                 valid_frames=None) -> jnp.ndarray:
        assert self._calibrated, "call calibrate() before the first forward"
        if valid_t is None and valid_frames is None:
            # fixed-shape fast path: resample on int8 BEFORE the 1x1 proj
            # (bit-identical; proj commutes with time subsetting)
            h = _run_encoder_int8(
                self.enc, self._specs(), spec,
                time_take=self._time_take(spec.shape[2], num_frames))
            return self._head(h, num_frames, pre_resampled=True)
        h = _run_encoder_int8(self.enc, self._specs(), spec, valid_t=valid_t)
        return self._head(h, num_frames, valid_t, valid_frames)

    def logits_packed(self, re: jnp.ndarray, im: jnp.ndarray,
                      num_frames: int) -> jnp.ndarray:
        assert self._calibrated, "call calibrate() before the first forward"
        x = jnp.swapaxes(jnp.stack([re, im], axis=1), -1, -2)  # (B,2,F,T)
        h = _run_encoder_int8(self.enc, self._specs(), x, packed=True,
                              time_take=self._time_take(x.shape[3],
                                                        num_frames))
        return self._head(h, num_frames, pre_resampled=True)
