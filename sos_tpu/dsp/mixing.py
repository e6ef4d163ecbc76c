"""SNR-controlled noise mixing and bitstream -> sample-mask machinery.

Reproduces the reference's audio mixing core (m1 tools.py:770-869) and the
silent-interval sample masks used by both stages (m1 tools.py:770-792,
m2 dataset.py:167-190), including its quirks:

* each video-frame bit writes samples `[int(b*r), int((b+1)*r - 1))`,
  leaving a 1-sample gap at every frame boundary that is later healed by
  the run-length despeckle filter (runs shorter than 5 samples flip);
* mixtures are peak-normalized jointly with the clean/noise components
  (norm=0.5, m1 dataset.py:254,274).

Two implementations of each op:
* `*_np` — host-side numpy, loop-exact against the reference (used by
  dataset bookkeeping and tests);
* jnp versions — vectorized/jittable, used by the on-device mixing stage
  inside the training step (the TPU replacement for the reference's 60-70
  DataLoader worker processes).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Power / SNR mixing
# ---------------------------------------------------------------------------


def signal_power(x: jnp.ndarray, axis=-1) -> jnp.ndarray:
    """sum(|x|^2) (reference `power_of_signal`, m1 tools.py:800-801)."""
    return jnp.sum(jnp.abs(x * x), axis=axis)


def signal_power_np(x: np.ndarray) -> np.ndarray:
    return np.sum(np.abs(x ** 2))


def mix_at_snr(
    signal: jnp.ndarray,
    noise: jnp.ndarray,
    snr_db: jnp.ndarray,
    norm: Optional[float] = 0.5,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Scale `noise` to `snr_db` below `signal` and mix; peak-normalize jointly.

    Vectorized equivalent of the reference `add_signals`
    (m1 tools.py:804-843) for batched `(..., L)` inputs and per-item snr.
    Returns (mixed, clean, noise) — all scaled by the same factor.
    """
    snr_db = jnp.asarray(snr_db, dtype=signal.dtype)
    p_sig = signal_power(signal)
    p_noise = signal_power(noise)
    pn = p_sig / jnp.power(10.0, snr_db / 10.0)
    ratio = jnp.sqrt(p_noise) / jnp.sqrt(jnp.maximum(pn, 1e-30))
    safe_ratio = jnp.where(ratio == 0, 1.0, ratio)
    scaled_noise = noise / safe_ratio[..., None]
    # signal_power == 0 -> add the noise unscaled (reference branch)
    scaled_noise = jnp.where((p_sig == 0)[..., None], noise, scaled_noise)
    mixed = signal + scaled_noise
    if norm:
        scale = jnp.max(jnp.abs(mixed), axis=-1) / norm
        scale = jnp.where(scale == 0, 1.0, scale)[..., None]
        return mixed / scale, signal / scale, scaled_noise / scale
    return mixed, signal, scaled_noise


def mix_at_snr_np(
    signal: np.ndarray,
    noise: np.ndarray,
    snr_db: float,
    norm: Optional[float] = 0.5,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side reference-exact `add_signals` (m1 tools.py:804-843)."""
    p_sig = signal_power_np(signal)
    mixed = np.copy(signal)
    if p_sig == 0:
        new_noise = noise
    else:
        pn = p_sig / np.power(10.0, snr_db / 10.0)
        ratio = np.sqrt(signal_power_np(noise)) / np.sqrt(pn)
        new_noise = noise if ratio == 0 else noise / ratio
    mixed = mixed + new_noise
    if norm:
        scale = np.max(np.abs(mixed)) / norm
        if scale != 0:
            return mixed / scale, signal / scale, new_noise / scale
    return mixed, signal, new_noise


def crop_noise_np(
    noise: np.ndarray,
    target_len: int,
    start: Optional[int] = None,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Crop (and zero-pad) a noise track to `target_len` samples.

    Reference `add_noise_to_audio` crop logic (m1 tools.py:846-866).
    """
    if start is None:
        slack = len(noise) - target_len
        if slack > 0:
            rng = rng or np.random.default_rng()
            start = int(rng.integers(0, slack + 1))
        elif slack == 0:
            start = 0
        else:
            raise ValueError(
                f"noise shorter than target: {len(noise)} < {target_len}")
    cropped = noise[start:start + target_len]
    if len(cropped) < target_len:
        cropped = np.concatenate(
            [cropped, np.zeros(target_len - len(cropped), dtype=cropped.dtype)])
    return cropped


# ---------------------------------------------------------------------------
# Bitstream -> sample masks
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=32)
def frame_sample_matrix(
    num_frames: int, num_samples: int, ratio: float
) -> np.ndarray:
    """(num_frames, num_samples) 0/1 assignment matrix A.

    A[f, i] = 1 iff sample i is written by frame f, i.e.
    int(f*ratio) <= i < int((f+1)*ratio) - 1 — reproducing the reference's
    1-sample frame-boundary gap (m1 tools.py:772-778). Gap samples and the
    tail beyond the bitstream have all-zero columns. Mask construction is
    then the matmul `(1 - bits) @ A`, which rides the MXU on device.
    """
    a = np.zeros((num_frames, num_samples), dtype=np.float32)
    for f in range(num_frames):
        lo = int(f * ratio)
        hi = int((f + 1) * ratio - 1)
        a[f, lo:min(hi, num_samples)] = 1.0
    return a


def bitstream_to_sample_mask_np(
    bits: np.ndarray, ratio: float, num_samples: int, despeckle_min_run: int = 5
) -> np.ndarray:
    """Silence sample mask (1=silent) from per-frame bits (0=silent, 1=voiced).

    Host-exact `convert_bitstreammask_to_audiomask` (m1 tools.py:770-792):
    frame writes with the boundary gap, then runs shorter than
    `despeckle_min_run` are flipped.
    """
    bits = np.asarray(bits, dtype=np.float32)
    # O(num_samples) difference-array expansion — exactly `(1-bits) @ A`
    # for the frame_sample_matrix geometry, WITHOUT materializing the
    # dense (num_frames, num_samples) matrix: full-utterance eval calls
    # this with whole-file lengths (a 60 s file at 14 kHz/30 fps would
    # be an 1800 x 840000 ~ 6 GB matrix, and the lru_cache would pin 32
    # of them). Frame bodies are disjoint, so a +/- at each body's
    # [lo, hi) edges followed by a cumsum reproduces the matmul exactly.
    num_frames = len(bits)
    f = np.arange(num_frames, dtype=np.float64)
    lo = (f * ratio).astype(np.int64)
    hi = ((f + 1.0) * ratio - 1.0).astype(np.int64)  # 1-sample boundary gap
    hi = np.clip(np.minimum(hi, num_samples), 0, None)
    lo = np.minimum(lo, num_samples)
    hi = np.maximum(hi, lo)
    inv = 1.0 - bits
    diff = np.zeros(num_samples + 1, dtype=np.float32)
    np.add.at(diff, lo, inv)
    np.add.at(diff, hi, -inv)
    mask = np.cumsum(diff[:-1], dtype=np.float32)
    return despeckle_mask_np(mask, despeckle_min_run)


@functools.lru_cache(maxsize=32)
def _despeckle_gap_matrix(
    num_frames: int, num_samples: int, ratio: float, min_run: int
) -> Optional[np.ndarray]:
    """(num_frames, num_samples) matrix G turning despeckle into a matmul.

    With the production geometry (ratio ~467 samples/frame, min_run=5),
    every sample-run shorter than `min_run` is one of exactly two
    shapes: (a) the 1-sample frame-boundary gap between two SILENT
    frames (flips to 1 iff both neighbors are silent), or (b) the final
    gap+tail when it is shorter than `min_run` (flips iff the last frame
    is silent). Both are linear in pairwise products of the inverted
    bits, so the despeckled mask is

        (1-b) @ A  +  [concat((1-b[:-1])*(1-b[1:]), 1-b[-1:])] @ G

    — two MXU matmuls instead of the generic cumsum + segment_sum +
    gather over every sample (which costs ~50 ms/batch-128 in the fused
    program). Returns None when the geometry breaks the "short runs are
    only gaps" invariant (clipped frame bodies, bodies < min_run) — the
    caller then falls back to the generic `despeckle_mask`.
    """
    g = np.zeros((num_frames, num_samples), dtype=np.float32)
    if min_run <= 1:
        return g  # nothing can flip: despeckle is the identity
    last_hi = int(num_frames * ratio - 1)
    if last_hi > num_samples:
        return None  # clipped frame bodies: generic path
    for f in range(num_frames):
        lo = int(f * ratio)
        hi = int((f + 1) * ratio - 1)
        if hi - lo < min_run:
            return None  # a frame body itself could be a short run
        if f < num_frames - 1:
            g[f, hi] = 1.0  # interior gap: flips iff frames f, f+1 silent
    tail_len = num_samples - last_hi
    if 0 < tail_len < min_run:
        g[num_frames - 1, last_hi:] = 1.0  # final gap+tail short run
    return g


# Above this many (num_frames * num_samples) elements the dense
# assignment/gap matrices are replaced by O(num_samples) gather maps:
# full-utterance buckets (e.g. a 60 s utterance: 1800 x 840000 ~ 6 GB
# f32) cannot afford the dense form, while the production 2 s clip
# (60 x 28000, ~6.7 MB) keeps the measured MXU-matmul formulation.
_DENSE_MASK_MAX_ELEMS = 1 << 24


@functools.lru_cache(maxsize=8)
def _frame_sample_maps(
    num_frames: int, num_samples: int, ratio: float, min_run: int
):
    """O(num_samples) equivalent of the dense matrices: per-sample
    covering-frame index + in-body indicator, and the despeckle gap map
    (same short-run geometry as `_despeckle_gap_matrix`; `gap_ok=False`
    means the caller must use the generic despeckle fallback)."""
    f = np.arange(num_frames, dtype=np.float64)
    lo = (f * ratio).astype(np.int64)
    hi = ((f + 1.0) * ratio - 1.0).astype(np.int64)
    hi_c = np.minimum(hi, num_samples)
    idx = np.arange(num_samples, dtype=np.int64)
    fmap = np.clip(np.searchsorted(lo, idx, side="right") - 1,
                   0, num_frames - 1)
    body = ((idx >= lo[fmap]) & (idx < hi_c[fmap])).astype(np.float32)
    # gap map: mirrors _despeckle_gap_matrix's validity conditions
    gmap = np.zeros(num_samples, dtype=np.int32)
    gmask = np.zeros(num_samples, dtype=np.float32)
    gap_ok = True
    if min_run > 1:
        last_hi = int(num_frames * ratio - 1)
        if last_hi > num_samples or np.any(hi - lo < min_run):
            gap_ok = False  # clipped/short frame bodies: generic path
        else:
            # all interior gaps lie strictly below last_hi <= num_samples
            # (monotone hi, ratio > min_run >= 2), so no filtering —
            # gap at hi[f] is gated by pair element f
            interior = hi[:-1]
            gmask[interior] = 1.0
            gmap[interior] = np.arange(num_frames - 1, dtype=np.int32)
            tail_len = num_samples - last_hi
            if 0 < tail_len < min_run:
                gmask[last_hi:] = 1.0
                gmap[last_hi:] = num_frames - 1
    return fmap.astype(np.int32), body, gmap, gmask, gap_ok


def bitstream_to_sample_mask(
    bits: jnp.ndarray, ratio: float, num_samples: int, despeckle_min_run: int = 5
) -> jnp.ndarray:
    """Device-side batched version: bits `(..., num_frames)` -> mask `(..., num_samples)`."""
    num_frames = bits.shape[-1]
    inv = 1.0 - bits.astype(jnp.float32)
    if num_frames * num_samples > _DENSE_MASK_MAX_ELEMS:
        fmap, body, gmap, gmask, gap_ok = _frame_sample_maps(
            num_frames, num_samples, ratio, despeckle_min_run)
        mask = jnp.take(inv, jnp.asarray(fmap), axis=-1) * jnp.asarray(body)
        if despeckle_min_run <= 1:
            return mask
        if not gap_ok:
            return despeckle_mask(mask, despeckle_min_run)
        pair = jnp.concatenate(
            [inv[..., :-1] * inv[..., 1:], inv[..., -1:]], axis=-1)
        return mask + jnp.take(pair, jnp.asarray(gmap),
                               axis=-1) * jnp.asarray(gmask)
    a = jnp.asarray(frame_sample_matrix(num_frames, num_samples, ratio))
    mask = jnp.matmul(inv, a, precision=jax.lax.Precision.HIGHEST)
    gap = _despeckle_gap_matrix(num_frames, num_samples, ratio,
                                despeckle_min_run)
    if gap is None:
        return despeckle_mask(mask, despeckle_min_run)
    pair = jnp.concatenate([inv[..., :-1] * inv[..., 1:], inv[..., -1:]],
                           axis=-1)
    return mask + jnp.matmul(pair, jnp.asarray(gap),
                             precision=jax.lax.Precision.HIGHEST)


def despeckle_mask_np(mask: np.ndarray, min_run: int = 5) -> np.ndarray:
    """Flip 0/1 runs shorter than `min_run` (based on the original runs)."""
    mask = np.asarray(mask, dtype=np.float32).copy()
    n = len(mask)
    if n == 0:
        return mask
    change = np.ones(n, dtype=bool)
    change[1:] = mask[1:] != mask[:-1]
    run_id = np.cumsum(change) - 1
    run_len = np.bincount(run_id)
    flip = run_len[run_id] < min_run
    mask[flip] = 1.0 - mask[flip]
    return mask


def despeckle_mask(mask: jnp.ndarray, min_run: int = 5) -> jnp.ndarray:
    """Vectorized run-length despeckle for `(..., L)` 0/1 masks.

    Same semantics as the reference's groupby loop (m1 tools.py:784-790):
    run membership is computed on the *original* mask, all short runs flip.
    """
    length = mask.shape[-1]
    change = jnp.concatenate(
        [jnp.ones(mask.shape[:-1] + (1,), dtype=jnp.int32),
         (mask[..., 1:] != mask[..., :-1]).astype(jnp.int32)],
        axis=-1,
    )
    run_id = jnp.cumsum(change, axis=-1) - 1  # (..., L), values in [0, L)

    def _one(mask_1d, run_id_1d):
        run_len = jax.ops.segment_sum(
            jnp.ones_like(run_id_1d), run_id_1d, num_segments=length)
        flip = run_len[run_id_1d] < min_run
        return jnp.where(flip, 1.0 - mask_1d, mask_1d)

    flat_mask = mask.reshape(-1, length)
    flat_rid = run_id.reshape(-1, length)
    out = jax.vmap(_one)(flat_mask, flat_rid)
    return out.reshape(mask.shape)


# ---------------------------------------------------------------------------
# Bitstream string helpers (host)
# ---------------------------------------------------------------------------


def truncate_padding(bitstream: str) -> Tuple[int, int]:
    """Indices (start, end) trimming leading/trailing '2' padding chars.

    Reference `truncate` (m1 tools.py:270-274) returns (idx, -idx2); here
    `end` is a normal positive end index. Raises if the stream has no '2'
    padding on either side (callers fall back to the full span, matching
    the reference's try/except at tools.py:305-309).
    """
    n = len(bitstream)
    start = 0
    while start < n and bitstream[start] == "2":
        start += 1
    end = n
    while end > start and bitstream[end - 1] == "2":
        end -= 1
    if start == 0 and end == n and ("2" not in bitstream):
        return 0, n
    return start, end


def bandpass_filter(signal: np.ndarray, lowcut: float, highcut: float,
                    sr: int, order: int = 5) -> np.ndarray:
    """Butterworth band-pass (reference's experimental helper,
    m2 tools.py:365-380; kept for the commented 300-3400 Hz speech-band
    post-filter in m2 predict.py)."""
    from scipy.signal import butter, lfilter

    nyq = 0.5 * sr
    b, a = butter(order, [lowcut / nyq, highcut / nyq], btype="band")
    return lfilter(b, a, signal).astype(np.float32)


def filter_bitstream(bits: str, min_silent_interval: int) -> str:
    """Overwrite '0'-runs shorter than `min_silent_interval` with '1's.

    Reference `filter_bitstream` (m1 tools.py:277-294).
    """
    out = list(bits)
    i = 0
    n = len(bits)
    while i < n:
        j = i
        while j < n and bits[j] == bits[i]:
            j += 1
        if bits[i] == "0" and (j - i) < min_silent_interval:
            for k in range(i, j):
                out[k] = "1"
        i = j
    return "".join(out)
