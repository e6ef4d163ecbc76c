"""Bidirectional LSTM as an XLA scan with hoisted input projections.

The reference uses cuDNN `nn.LSTM` (m1 networks.py:95, m2 networks.py:64).
The TPU-native shape of the same computation:

* the input projection `x @ W_ih + b` is ONE big (T*B, C) x (C, 4H)
  matmul hoisted out of the recurrence — it rides the MXU and is >90% of
  the FLOPs at these sizes (C=2048/3072, H=100/200);
* only the tiny recurrent matmul (H x 4H) lives inside `lax.scan`;
* the backward direction reuses the same scan on a reversed sequence.

Gate order is torch-compatible (i, f, g, o) so `.pth` weights import
verbatim. Accumulation is float32 regardless of compute dtype — LSTM
recurrences are precision-sensitive (SURVEY.md §7 risks).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

_HIGHEST = jax.lax.Precision.HIGHEST


def lstm_scan(
    x_proj: jnp.ndarray,  # (T, B, 4H): x @ W_ih^T + b_ih + b_hh, precomputed
    w_hh: jnp.ndarray,    # (H, 4H)
    reverse: bool = False,
    step_mask: Optional[jnp.ndarray] = None,  # (T,) 1=valid, 0=padding
) -> jnp.ndarray:
    """Run the LSTM recurrence over pre-projected inputs. Returns (T, B, H).

    `step_mask` zeroes the carry at padding steps, so a reverse scan over a
    zero-padded tail enters the valid region with a fresh (zero) state —
    bucketed sequences then produce *exactly* the same valid-step outputs
    as unpadded ones.
    """
    hidden = w_hh.shape[0]
    batch = x_proj.shape[1]
    h0 = jnp.zeros((batch, hidden), dtype=jnp.float32)
    c0 = jnp.zeros((batch, hidden), dtype=jnp.float32)

    def step(carry, inputs):
        if step_mask is None:
            xp = inputs
        else:
            xp, m = inputs
        h, c = carry
        gates = xp + jnp.matmul(h, w_hh, precision=_HIGHEST)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        if step_mask is not None:
            h_new = h_new * m
            c_new = c_new * m
        return (h_new, c_new), h_new

    xs = x_proj.astype(jnp.float32)
    if step_mask is not None:
        xs = (xs, step_mask.astype(jnp.float32)[:, None, None])
    _, hs = jax.lax.scan(step, (h0, c0), xs, reverse=reverse)
    return hs


class BiLSTM(nn.Module):
    """Single-layer bidirectional LSTM, torch parameter layout.

    Input/output are batch-major `(B, T, C)` -> `(B, T, 2H)` (forward and
    backward states concatenated, matching `nn.LSTM(bidirectional=True)`).

    `bf16_proj=True` runs the hoisted input projection in bfloat16 (the
    recurrence and bias add stay float32) — the projection is >90% of
    the FLOPs and rides the MXU at ~6x the f32-HIGHEST rate. Opt-in for
    quantized serving heads only; training and f32 eval keep the exact
    default.
    """

    hidden: int
    bf16_proj: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 valid_len: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """x: (B, T, C). With `valid_len` (traced scalar), steps >= valid_len
        are treated as padding: outputs there are zero and the backward
        direction starts fresh at valid_len-1 (exact bucketing)."""
        in_features = x.shape[-1]
        h = self.hidden

        def _make(direction: str):
            # torch init: U(-1/sqrt(H), 1/sqrt(H)) for all LSTM params
            bound = 1.0 / jnp.sqrt(jnp.asarray(float(h)))
            init = lambda key, shape: jax.random.uniform(
                key, shape, jnp.float32, -bound, bound)
            w_ih = self.param(f"w_ih_{direction}", init, (in_features, 4 * h))
            w_hh = self.param(f"w_hh_{direction}", init, (h, 4 * h))
            b_ih = self.param(f"b_ih_{direction}", init, (4 * h,))
            b_hh = self.param(f"b_hh_{direction}", init, (4 * h,))
            return w_ih, w_hh, b_ih + b_hh

        x32 = x.astype(jnp.float32)
        tmaj = jnp.swapaxes(x32, 0, 1)  # (T, B, C)

        w_ih_f, w_hh_f, b_f = _make("fwd")
        w_ih_b, w_hh_b, b_b = _make("bwd")
        step_mask = None
        if valid_len is not None:
            t_total = x.shape[1]
            step_mask = (jnp.arange(t_total) < valid_len)
        # Hoisted input projections: one MXU matmul per direction.
        if self.bf16_proj:
            tb = tmaj.astype(jnp.bfloat16)
            proj_f = jnp.matmul(tb, w_ih_f.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32) + b_f
            proj_b = jnp.matmul(tb, w_ih_b.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32) + b_b
        else:
            proj_f = jnp.matmul(tmaj, w_ih_f, precision=_HIGHEST) + b_f
            proj_b = jnp.matmul(tmaj, w_ih_b, precision=_HIGHEST) + b_b
        hs_f = lstm_scan(proj_f, w_hh_f, reverse=False, step_mask=step_mask)
        hs_b = lstm_scan(proj_b, w_hh_b, reverse=True, step_mask=step_mask)
        out = jnp.concatenate([hs_f, hs_b], axis=-1)  # (T, B, 2H)
        return jnp.swapaxes(out, 0, 1).astype(x.dtype)
