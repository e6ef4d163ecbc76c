"""Shared flax building blocks with torch-compatible numerics.

Every block reproduces the corresponding reference module's math exactly
(same padding rule, same normalization statistics, same activation), so
that `.pth` checkpoints import weight-for-weight:

* :class:`ConvBlock`      — Conv2d + BatchNorm + ReLU with "same" dilated
                            padding (m1/m2 networks.py Conv2dBlock/ConvBlock).
* :class:`DownConvBlock`  — ReflectionPad + strided Conv2d + BN + PReLU
                            (m2 networks.py:97-117).
* :class:`UpConvBlock`    — ConvTranspose2d + BN + PReLU
                            (m2 networks.py:120-149).

All convolutions run in NHWC = (B, F, T, C).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

_DEFAULT = jax.lax.Precision.DEFAULT


def _kaiming_uniform_conv(key, shape, dtype=jnp.float32):
    """torch Conv2d default weight init: kaiming_uniform(a=sqrt(5)).

    shape is HWIO: fan_in = H*W*I; bound = sqrt(6 / ((1 + a^2) * fan_in))
    = 1/sqrt(fan_in).
    """
    fan_in = shape[0] * shape[1] * shape[2]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _torch_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class PReLU(nn.Module):
    """Channel-shared PReLU (torch default: one learnable slope, init 0.25)."""

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", lambda *_: jnp.asarray(0.25, jnp.float32))
        return jnp.where(x >= 0, x, alpha.astype(x.dtype) * x)


def apply_activation(x, act: Optional[str], module: nn.Module, name: str):
    if act is None:
        return x
    if act == "relu":
        return nn.relu(x)
    if act == "prelu":
        return PReLU(name=name)(x)
    if act == "lrelu":
        return nn.leaky_relu(x, negative_slope=0.01)
    if act == "tanh":
        return jnp.tanh(x)
    if act == "sigmoid":
        return nn.sigmoid(x)
    raise ValueError(f"unknown activation {act}")


class TorchBatchNorm(nn.Module):
    """BatchNorm2d with torch semantics (momentum 0.1, eps 1e-5, biased var).

    flax's BatchNorm matches given momentum=0.9; wrapped here so the
    defaults are pinned in one place and `use_running_average` is driven
    by the module-level `train` flag.
    """

    use_running_average: bool = True

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(
            use_running_average=self.use_running_average,
            momentum=0.9,
            epsilon=1e-5,
            dtype=x.dtype,
            param_dtype=jnp.float32,
            axis_name=None,
        )(x)


class ConvBlock(nn.Module):
    """Conv2d("same" dilated padding) + BN + activation.

    Matches m1 networks.py:28-51 / m2 networks.py:28-51: per-side padding
    `((k-1)//2 * d)` on each spatial axis, bias only when norm is off.
    """

    features: int
    kernel_size: Tuple[int, int]
    dilation: Tuple[int, int] = (1, 1)
    stride: int = 1
    norm: Optional[str] = "bn"
    act: Optional[str] = "relu"
    train: bool = False

    @nn.compact
    def __call__(self, x):
        kf, kt = self.kernel_size
        df, dt = self.dilation
        pad = ((kf - 1) // 2 * df, (kt - 1) // 2 * dt)
        x = nn.Conv(
            features=self.features,
            kernel_size=(kf, kt),
            strides=(self.stride, self.stride),
            padding=((pad[0], pad[0]), (pad[1], pad[1])),
            kernel_dilation=(df, dt),
            use_bias=self.norm is None,
            kernel_init=_kaiming_uniform_conv,
            bias_init=_torch_bias_init(kf * kt * x.shape[-1]),
            dtype=x.dtype,
            param_dtype=jnp.float32,
            precision=_DEFAULT,
        )(x)
        if self.norm == "bn":
            x = TorchBatchNorm(use_running_average=not self.train)(x)
        return apply_activation(x, self.act, self, "act")


def zero_time_tail(x: jnp.ndarray, valid_t, axis: int = 2) -> jnp.ndarray:
    """Zero entries at time index >= valid_t (traced scalar)."""
    mask = (jnp.arange(x.shape[axis]) < valid_t)
    shape = [1] * x.ndim
    shape[axis] = x.shape[axis]
    return x * mask.reshape(shape).astype(x.dtype)


def reflect_time_tail(x: jnp.ndarray, valid_t, pad: int,
                      offset: int = 0) -> jnp.ndarray:
    """Write reflected columns at the *dynamic* valid boundary.

    Emulates an unpadded program's end-of-signal ReflectionPad: columns
    [offset+valid_t, offset+valid_t+pad) become x[offset+valid_t-2-j].
    Caller guarantees the static width fits (offset+valid_t+pad <= T).
    """
    src = offset + valid_t - 2 - jnp.arange(pad)
    vals = jnp.take(x, jnp.clip(src, 0, x.shape[2] - 1), axis=2)
    start = (jnp.int32(0), jnp.int32(0),
             jnp.asarray(offset + valid_t, jnp.int32), jnp.int32(0))
    return jax.lax.dynamic_update_slice(x, vals, start)


class DownConvBlock(nn.Module):
    """ReflectionPad + Conv2d(no pad, stride s) + BN + PReLU (m2 networks.py:97-117).

    With `valid_t` (traced scalar), runs the exact length-bucketed variant:
    the time tail beyond valid_t is zeroed, the end-boundary reflection is
    injected at the dynamic boundary, and the output is re-zeroed beyond
    the propagated valid width. Returns (y, valid_out) in that mode.
    """

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    norm: Optional[str] = "bn"
    act: Optional[str] = "prelu"
    train: bool = False

    @nn.compact
    def __call__(self, x, valid_t=None):
        k, d = self.kernel_size, self.dilation
        pad = (k - 1) // 2 * d
        if pad:
            if valid_t is None:
                x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                            mode="reflect")
            else:
                x = zero_time_tail(x, valid_t)
                # freq: full static reflect; time: left reflect is exact
                # (start boundary is real), right side zero-padded then the
                # true reflection injected at the dynamic boundary.
                x = jnp.pad(x, ((0, 0), (pad, pad), (pad, 0), (0, 0)),
                            mode="reflect")
                x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
                x = reflect_time_tail(x, valid_t, pad, offset=pad)
        x = nn.Conv(
            features=self.features,
            kernel_size=(k, k),
            strides=(self.stride, self.stride),
            padding="VALID",
            kernel_dilation=(d, d),
            use_bias=self.norm is None,
            kernel_init=_kaiming_uniform_conv,
            bias_init=_torch_bias_init(k * k * x.shape[-1]),
            dtype=x.dtype,
            param_dtype=jnp.float32,
            precision=_DEFAULT,
        )(x)
        if self.norm == "bn":
            x = TorchBatchNorm(use_running_average=not self.train)(x)
        x = apply_activation(x, self.act, self, "act")
        if valid_t is None:
            return x
        keff = d * (k - 1) + 1
        valid_out = (valid_t + 2 * pad - keff) // self.stride + 1
        return zero_time_tail(x, valid_out), valid_out


class UpConvBlock(nn.Module):
    """ConvTranspose2d(k, s, p=(k-1)//2) + BN + PReLU (m2 networks.py:120-149).

    Implemented as an input-dilated convolution with a spatially flipped
    kernel — the exact definition of torch's ConvTranspose2d — so output
    sizes follow `(in-1)*s - 2p + k + output_padding`.

    `output_padding`: the reference constructs its up-convs as
    `nn.ConvTranspose2d(in, out, k, stride, pad, dilation, bias=...)`
    (m2 networks.py:130) — but ConvTranspose2d's 6th positional parameter
    is *output_padding*, not dilation, so every reference up-conv actually
    runs with output_padding=1 (outputs sized 2*in, not 2*in-1). Faithful
    checkpoint parity requires replicating that quirk.
    """

    features: int
    kernel_size: int
    stride: int = 2
    dilation: int = 1
    output_padding: int = 0
    norm: Optional[str] = "bn"
    act: Optional[str] = "prelu"
    train: bool = False

    @nn.compact
    def __call__(self, x, valid_t=None):
        k, s = self.kernel_size, self.stride
        if valid_t is not None:
            # zeroed tail contributes nothing to the transposed conv, so
            # outputs below the exact width are untouched by padding
            x = zero_time_tail(x, valid_t)
        p = (k - 1) // 2 * self.dilation
        in_ch = x.shape[-1]
        # torch ConvTranspose2d weight is (in, out, kH, kW); stored here as
        # HWIO with I=in_ch so importers transpose (2,3,0,1).
        fan_in = (k * k // (s * s) + 1) * self.features  # approx torch fan-in
        bound = 1.0 / math.sqrt(max(k * k * self.features, 1))
        kernel = self.param(
            "kernel",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -bound, bound),
            (k, k, in_ch, self.features),
        )
        use_bias = self.norm is None
        flipped = kernel[::-1, ::-1].astype(x.dtype)
        pad_amt = k - 1 - p
        op = self.output_padding
        y = jax.lax.conv_general_dilated(
            x,
            flipped,
            window_strides=(1, 1),
            padding=((pad_amt, pad_amt + op), (pad_amt, pad_amt + op)),
            lhs_dilation=(s, s),
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=_DEFAULT,
        )
        if use_bias:
            bias = self.param("bias", _torch_bias_init(fan_in), (self.features,))
            y = y + bias.astype(y.dtype)
        if self.norm == "bn":
            y = TorchBatchNorm(use_running_average=not self.train)(y)
        y = apply_activation(y, self.act, self, "act")
        if valid_t is None:
            return y
        valid_out = (valid_t - 1) * s - 2 * p + k + op
        return zero_time_tail(y, valid_out), valid_out


class TorchLinear(nn.Module):
    """nn.Linear with torch's default init (kaiming_uniform + fan-in bias)."""

    features: int

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        bound = 1.0 / math.sqrt(in_features)
        kernel = self.param(
            "kernel",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -bound, bound),
            (in_features, self.features),
        )
        bias = self.param(
            "bias",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -bound, bound),
            (self.features,),
        )
        return jnp.matmul(x, kernel.astype(x.dtype)) + bias.astype(x.dtype)
