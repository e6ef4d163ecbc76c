"""Pallas TPU kernel: fused framing + window + DFT (STFT front-end).

The jnp STFT (sos_tpu.dsp.stft) materializes the framed signal
(B, T, 510) in HBM — a 3.3x blow-up of the input that is immediately
re-read by the DFT matmul. This kernel keeps framing entirely in VMEM.

Mosaic constraints shape the design (no 1D->2D shape casts, DMA slices
and matmul operands must be lane/sublane aligned):

  * the signal is laid out host-side as hop-rows padded to 256 lanes:
    (B, R, 256) with row r = y[r*hop : (r+1)*hop] ++ zeros;
  * frame t's hop-chunk c is exactly row (t + c), so the windowed DFT
    factors into `sum_c rows[t+c] @ M_c` where M_c is the (256, 2*bins)
    zero-row-padded chunk of the analysis matrix — full aligned matmuls,
    no in-kernel slicing or frame assembly;
  * grid = (B, ceil(T / TILE_T)); each program issues `n_chunks` aligned
    row-block DMAs (double-buffered by chunk) and accumulates the chunk
    matmuls on the MXU.

Numerics identical to dsp.stft (same analysis matrix). Validated against
the jnp path in tests (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sos_tpu.config import HOP_LENGTH, N_FFT, WIN_LENGTH
from sos_tpu.dsp.stft import _analysis_matrix

TILE_T = 128   # frames per program
ROW_PAD = 256  # hop rows padded to this many lanes (2 x 128)


@functools.lru_cache(maxsize=8)
def _chunked_analysis_matrix(n_fft: int, win_length: int, hop: int) -> np.ndarray:
    """(n_chunks, ROW_PAD, 2*bins): analysis matrix split into hop-chunks,
    each zero-padded to ROW_PAD rows so kernels avoid unaligned slices."""
    mat = _analysis_matrix(n_fft, win_length)  # (n_fft, 2*bins)
    n_chunks = -(-n_fft // hop)
    out = np.zeros((n_chunks, ROW_PAD, mat.shape[1]), dtype=np.float32)
    for c in range(n_chunks):
        width = min(hop, n_fft - c * hop)
        out[c, :width, :] = mat[c * hop:c * hop + width, :]
    return out


def _stft_kernel(sig_hbm, mat_ref, out_ref, scratch, sem, *, n_chunks: int):
    i = pl.program_id(0)  # batch row (sig stays whole in ANY/HBM)
    j = pl.program_id(1)
    rows = scratch.shape[0]  # TILE_T + 8 (sublane-aligned halo)

    # One aligned DMA (offset j*TILE_T is 8-divisible, rows is too).
    dma = pltpu.make_async_copy(
        sig_hbm.at[i, pl.ds(j * TILE_T, rows), :], scratch.at[:, :], sem)
    dma.start()
    dma.wait()

    # Chunk c needs rows [c, c+TILE_T); sublane offsets 1..3 are not
    # 8-aligned, so realize the shift with pltpu.roll and take the
    # offset-0 window instead.
    acc = jnp.zeros(out_ref.shape[1:], dtype=jnp.float32)
    window = scratch[:, :]
    for c in range(n_chunks):
        # roll requires non-negative shifts: -c == rows - c (mod rows)
        shifted = window if c == 0 else pltpu.roll(window, rows - c, 0)
        acc = acc + jnp.dot(shifted[:TILE_T, :], mat_ref[c],
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
    out_ref[0, :, :] = acc


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length",
                                             "win_length", "interpret"))
def stft_pallas(
    y: jnp.ndarray,
    n_fft: int = N_FFT,
    hop_length: int = HOP_LENGTH,
    win_length: int = WIN_LENGTH,
    interpret: bool = False,
) -> jnp.ndarray:
    """Centered STFT of (B, L) -> (B, F, T, 2); same contract as dsp.stft."""
    if y.ndim == 1:
        y = y[None]
    bins = n_fft // 2 + 1
    pad = n_fft // 2
    y = jnp.pad(y.astype(jnp.float32), [(0, 0), (pad, pad)], mode="reflect")
    b, length = y.shape
    num_frames = (length - n_fft) // hop_length + 1
    num_tiles = -(-num_frames // TILE_T)
    n_chunks = -(-n_fft // hop_length)
    halo_rows = -(-n_chunks // 8) * 8  # sublane-aligned halo
    rows_needed = (num_tiles - 1) * TILE_T + TILE_T + halo_rows
    padded_len = rows_needed * hop_length
    if length < padded_len:
        y = jnp.pad(y, [(0, 0), (0, padded_len - length)])
    sig_rows = y[:, :padded_len].reshape(b, rows_needed, hop_length)
    sig_rows = jnp.pad(sig_rows, [(0, 0), (0, 0), (0, ROW_PAD - hop_length)])

    mat = jnp.asarray(_chunked_analysis_matrix(n_fft, win_length, hop_length))

    out = pl.pallas_call(
        functools.partial(_stft_kernel, n_chunks=n_chunks),
        out_shape=jax.ShapeDtypeStruct((b, num_tiles * TILE_T, 2 * bins),
                                       jnp.float32),
        grid=(b, num_tiles),
        in_specs=[
            # ANY-space blocks must equal the array shape (Mosaic rule);
            # per-row slices are DMA'd inside the kernel.
            pl.BlockSpec(sig_rows.shape, lambda i, j: (0, 0, 0),
                         memory_space=pltpu.ANY),
            pl.BlockSpec(mat.shape, lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_T, 2 * bins), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((TILE_T + halo_rows, ROW_PAD), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(sig_rows, mat)

    spec = out[:, :num_frames, :]
    re, im = spec[..., :bins], spec[..., bins:]
    packed = jnp.stack([re, im], axis=-1)  # (B, T, F, 2)
    return jnp.swapaxes(packed, -3, -2)
