"""torch.nn.functional.interpolate-compatible resizing.

The detector resamples its conv features from the STFT frame grid (~178
frames) to the 60-frame video grid with `F.interpolate(f_s, size=60)`
(m1 networks.py:133) whose default mode is *nearest* with source index
`floor(i * in/out)`. jax.image.resize uses half-pixel centers, which
disagrees — so the exact index rule is reproduced here with a static
gather (XLA folds it into a copy).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _nearest_indices(in_len: int, out_len: int) -> np.ndarray:
    # torch nearest (recompute_scale_factor default): src = floor(dst * in/out)
    idx = np.floor(np.arange(out_len) * (in_len / out_len)).astype(np.int32)
    return np.minimum(idx, in_len - 1)


def nearest_resize_1d(x: jnp.ndarray, out_len: int, axis: int) -> jnp.ndarray:
    """Nearest-neighbor resize along `axis` with torch index semantics."""
    in_len = x.shape[axis]
    if in_len == out_len:
        return x
    idx = jnp.asarray(_nearest_indices(in_len, out_len))
    return jnp.take(x, idx, axis=axis)


def nearest_resize_2d(x: jnp.ndarray, out_hw, h_axis: int, w_axis: int) -> jnp.ndarray:
    """Nearest 2-D resize used by InpaintNet's skip-shape fixups.

    m2 networks.py:199-203 calls `F.interpolate(out, size)` (mode nearest)
    when up-path shapes drift off the skip connections by one pixel.
    """
    x = nearest_resize_1d(x, out_hw[0], h_axis)
    x = nearest_resize_1d(x, out_hw[1], w_axis)
    return x


linear_resize_2d = nearest_resize_2d  # deprecated alias


def dynamic_nearest_time(x: jnp.ndarray, v_src, v_dst,
                         out_t_static: int) -> jnp.ndarray:
    """Nearest time-resize of the *valid* region with traced sizes.

    Maps output positions [0, v_dst) onto input [0, v_src) with the torch
    floor rule in exact integer arithmetic; output beyond v_dst is zeroed.
    Static output width is `out_t_static` (the skip tensor's padded width).
    Time axis is 2 (NHWC with F as H).
    """
    j = jnp.arange(out_t_static, dtype=jnp.int32)
    idx = (j * jnp.asarray(v_src, jnp.int32)) // jnp.maximum(
        jnp.asarray(v_dst, jnp.int32), 1)
    idx = jnp.clip(idx, 0, x.shape[2] - 1)
    y = jnp.take(x, idx, axis=2)
    mask = (j < v_dst).astype(y.dtype)[None, None, :, None]
    return y * mask
