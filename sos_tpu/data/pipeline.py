"""Host batchers + device-side mixing/STFT stages.

The reference burns 60-70 DataLoader worker processes running
librosa.load + SNR mixing + STFT per item on CPU (m1 dataset.py:178-352,
m2 dataset.py:144-320; SURVEY.md §3.1 "the dominant input cost"). The
TPU-native split:

* **host** (this module's batchers): decode WAVs once (cached), slice raw
  clip windows, pick noise crops/SNRs — pure indexing, no DSP;
* **device** (`device_mix_and_stft_*`): silence-masking, SNR mixing, the
  STFTs and ground-truth cRM run inside the jitted train step, fused by
  XLA with the model itself.

Batch layouts:
  detector:  clean (B, 28000), noise (B, 28000), snr (B,), bits (B, 60)
  denoiser:  clean (B, 28000), noise (B, 28000), snr (B,), bits (B, 60)
"""

from __future__ import annotations

import functools
from typing import Dict, Iterator, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sos_tpu.config import DataConfig, StftConfig
from sos_tpu.data.sampling import NoiseBank
from sos_tpu.data.windows import DenoiserWindow, DetectorWindow
from sos_tpu.dsp import audio_io
from sos_tpu.dsp.stft import stft as stft_fn
from sos_tpu.dsp.crm import compressed_crm
from sos_tpu.dsp.mixing import bitstream_to_sample_mask, mix_at_snr


# ---------------------------------------------------------------------------
# Device-side stages (jit-inlined into the train step)
# ---------------------------------------------------------------------------


def device_mix_and_stft_detector(
    clean: jnp.ndarray,   # (B, L) raw clean clips
    noise: jnp.ndarray,   # (B, L) noise crops
    snr_db: jnp.ndarray,  # (B,)
    bits: jnp.ndarray,    # (B, frames) 0=silent 1=voiced
    data_cfg: DataConfig = DataConfig(),
    stft_cfg: StftConfig = StftConfig(),
) -> Dict[str, jnp.ndarray]:
    """Silence-mask -> mix at SNR -> STFT, all on device (m1 dataset recipe)."""
    ratio = data_cfg.sample_rate / data_cfg.frame_rate
    mask = bitstream_to_sample_mask(bits, ratio, clean.shape[-1],
                                    data_cfg.despeckle_min_run)
    clean = clean * (1.0 - mask)  # enforce truly-silent intervals
    mixed, _, _ = mix_at_snr(clean, noise, snr_db, norm=data_cfg.mix_norm)
    spec = stft_fn(mixed, stft_cfg.n_fft, stft_cfg.hop_length,
                   stft_cfg.win_length)
    return {"audio": spec, "label": bits.astype(jnp.float32)}


def device_mix_and_stft_denoiser(
    clean: jnp.ndarray,
    noise: jnp.ndarray,
    snr_db: jnp.ndarray,
    bits: jnp.ndarray,
    data_cfg: DataConfig = DataConfig(),
    stft_cfg: StftConfig = StftConfig(),
) -> Dict[str, jnp.ndarray]:
    """m2 dataset recipe: four STFTs + ground-truth compressed cRM on device."""
    ratio = data_cfg.sample_rate / data_cfg.frame_rate
    mask = bitstream_to_sample_mask(bits, ratio, clean.shape[-1],
                                    data_cfg.despeckle_min_run)
    clean = clean * (1.0 - mask)
    mixed, clean_sig, full_noise = mix_at_snr(clean, noise, snr_db,
                                              norm=data_cfg.mix_norm)
    gated = mixed * mask  # silence-gated noise observation
    do_stft = functools.partial(
        stft_fn, n_fft=stft_cfg.n_fft, hop_length=stft_cfg.hop_length,
        win_length=stft_cfg.win_length)
    mixed_stft = do_stft(mixed)
    clean_stft = do_stft(clean_sig)
    gated_stft = do_stft(gated)
    full_noise_stft = do_stft(full_noise)
    crm_gt = compressed_crm(clean_stft, mixed_stft)
    return {
        "mixed": mixed_stft,
        "clean": clean_stft,
        "noise": gated_stft,
        "full_noise": full_noise_stft,
        "mask": crm_gt,
    }


# ---------------------------------------------------------------------------
# Host batchers
# ---------------------------------------------------------------------------


class _WavCache:
    """LRU decode-once cache of waveforms at the processing sample rate.

    Eviction is least-recently-USED (hits refresh recency), so a corpus
    larger than `capacity` keeps its hot set resident instead of cycling
    (FIFO would re-decode most files every epoch once the corpus exceeds
    the capacity — AVSPEECH's train split is 2,214 files).

    With `use_native=True`, decode+resample run through the C++ engine
    (sos_tpu.runtime) when the library builds; falls back silently.
    `prefetch_paths` bulk-decodes a batch's cache misses with the
    engine's threaded `load_batch` so batch assembly pays one parallel
    decode instead of serial per-file decodes.
    """

    def __init__(self, sample_rate: int, capacity: int = 2048,
                 use_native: bool = True):
        import collections

        self.sample_rate = sample_rate
        self.capacity = capacity
        self._store: "collections.OrderedDict[str, np.ndarray]" = \
            collections.OrderedDict()
        self._engine = None
        if use_native:
            try:
                from sos_tpu.runtime import NativeAudioEngine, native_available

                if native_available():
                    self._engine = NativeAudioEngine()
            except Exception:
                self._engine = None

    def _put(self, path: str, wav: np.ndarray) -> None:
        if self.capacity <= 0:
            return  # caching disabled: every get() decodes
        while len(self._store) >= self.capacity:
            self._store.popitem(last=False)
        self._store[path] = wav

    def get(self, path: str) -> np.ndarray:
        hit = self._store.get(path)
        if hit is not None:
            self._store.move_to_end(path)
            return hit
        if self._engine is not None:
            wav, _ = self._engine.load(path, sr=self.sample_rate)
        else:
            wav, _ = audio_io.load(path, sr=self.sample_rate)
        self._put(path, wav)
        return wav

    def prefetch_paths(self, paths) -> None:
        """Decode all cache misses among `paths` in one threaded native
        call (no-op without the native engine — per-path `get` then
        decodes serially as before)."""
        missing = [p for p in dict.fromkeys(paths) if p not in self._store]
        if self._engine is None or len(missing) < 2:
            return
        from sos_tpu.runtime import resampled_length

        max_out = 0
        lengths_ok = True
        for p in missing:
            try:
                n, native_sr = self._engine.info(p)  # (samples, sample_rate)
            except OSError:
                lengths_ok = False  # let get() surface the error per-file
                break
            max_out = max(max_out,
                          resampled_length(n, native_sr, self.sample_rate))
        if not lengths_ok or max_out == 0:
            return
        buf, lengths = self._engine.load_batch(missing, self.sample_rate,
                                               max_out)
        for i, p in enumerate(missing):
            self._put(p, buf[i, : lengths[i]].copy())


class _BatcherBase:
    def __init__(
        self,
        windows: Sequence,
        noise_bank: NoiseBank,
        data_cfg: DataConfig,
        batch_size: int,
        shuffle: bool,
        seed: int = 0,
    ):
        self.windows = list(windows)
        self.noise = noise_bank
        self.cfg = data_cfg
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.cache = _WavCache(data_cfg.sample_rate,
                               capacity=data_cfg.wav_cache_capacity)
        self.epoch = 0
        # The jitted train step builds the device silence mask with the
        # CONFIGURED frame rate (one static frame->sample matrix per
        # program); a file whose own framerate differs would have its
        # labels/mask silently misaligned against the audio the host
        # sliced with the per-file rate. The full-utterance eval drivers
        # honor per-file framerates; training requires the canonical one.
        bad = sorted({w.framerate for w in self.windows
                      if abs(w.framerate - data_cfg.frame_rate) > 1e-9})
        if bad:
            raise ValueError(
                f"training windows carry framerates {bad} but the device "
                f"mix/STFT stage is built for frame_rate="
                f"{data_cfg.frame_rate}; re-encode the dataset at the "
                "configured rate (or change data.frame_rate)")

    def __len__(self) -> int:
        # fixed-shape batches only: the jitted step, shard_batch
        # divisibility and the epoch-order resume all assume every batch
        # has exactly batch_size items, so the remainder is dropped
        return len(self.windows) // self.batch_size

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def shard(self, host_id: int, num_hosts: int) -> "_BatcherBase":
        """Per-host window sharding for multi-host SPMD: host k keeps
        windows [k::num_hosts] (applied before the per-epoch shuffle so
        every host shuffles its own disjoint subset), truncated so EVERY
        host holds the same count — unequal per-host batch counts would
        desynchronize the SPMD step loop. Returns self."""
        if not 0 <= host_id < num_hosts:
            raise ValueError(f"host_id {host_id} not in [0, {num_hosts})")
        keep = len(self.windows) // num_hosts
        self.windows = self.windows[host_id::num_hosts][:keep]
        # Decorrelate the per-host rng streams: without this, every host
        # replays the SAME positional noise/SNR draws (iter_from seeds by
        # (seed, epoch) only), so item j of every host's batch gets the
        # identical noise crop — an N-host pod would cut noise-augmentation
        # diversity N-fold. Still fully deterministic given (host, epoch).
        self.seed = self.seed * num_hosts + host_id
        return self

    def _order(self) -> np.ndarray:
        idx = np.arange(len(self.windows))
        if self.shuffle:
            np.random.RandomState(self.seed + self.epoch).shuffle(idx)
        return idx

    def _clip_samples(self) -> int:
        raise NotImplementedError

    def _clean_clip(self, w) -> np.ndarray:
        raise NotImplementedError

    def _bits(self, w) -> np.ndarray:
        raise NotImplementedError

    def _draw_noise(self, rng, length: int):
        """One item's noise/SNR draws — factored out so `iter_from` can
        replay the exact rng stream of skipped batches without touching
        the (expensive) waveform cache."""
        track = self.noise.random_track(rng)
        start = int(rng.integers(0, max(1, len(track) - length + 1)))
        crop = track[start:start + length]
        if self.cfg.snr_idx is None:
            snr = self.cfg.snrs[int(rng.integers(0, len(self.cfg.snrs)))]
        else:
            snr = self.cfg.snrs[self.cfg.snr_idx]
        return crop, snr

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        return self.iter_from(0)

    def iter_from(self, start_batch: int) -> Iterator[Dict[str, np.ndarray]]:
        """Iterate the epoch's deterministic batch order from batch
        `start_batch` (exact mid-epoch resume). The skipped prefix replays
        only the per-item rng draws — identical stream to a full epoch —
        and never decodes audio, so resuming late in a large epoch is
        index-speed, not assembly-speed."""
        rng = np.random.default_rng(self.seed * 7919 + self.epoch)
        order = self._order()
        length = self._clip_samples()
        n_full = len(self)
        for b in range(n_full):
            sel = order[b * self.batch_size:(b + 1) * self.batch_size]
            if b < start_batch:
                for _ in sel:
                    self._draw_noise(rng, length)
                continue
            # bulk-decode this batch's cache misses (threaded C++ engine)
            self.cache.prefetch_paths(
                [self.windows[wi].audio_path for wi in sel])
            clean = np.zeros((len(sel), length), dtype=np.float32)
            noise = np.zeros((len(sel), length), dtype=np.float32)
            snr = np.zeros((len(sel),), dtype=np.float32)
            bits = np.zeros((len(sel), self.cfg.clip_frames), dtype=np.float32)
            for j, wi in enumerate(sel):
                w = self.windows[wi]
                clip = self._clean_clip(w)
                clean[j, :len(clip)] = clip[:length]
                crop, snr[j] = self._draw_noise(rng, length)
                noise[j, :len(crop)] = crop
                wb = self._bits(w)
                bits[j, :len(wb)] = wb[:self.cfg.clip_frames]
            yield {"clean": clean, "noise": noise, "snr": snr, "bits": bits}


class DetectorBatcher(_BatcherBase):
    """Batches of raw detector clips (m1 dataset windows: 60 video frames)."""

    def _clip_samples(self) -> int:
        return int(self.cfg.clip_frames / self.cfg.frame_rate * self.cfg.sample_rate)

    def _clean_clip(self, w: DetectorWindow) -> np.ndarray:
        snd = self.cache.get(w.audio_path)
        sr = self.cfg.sample_rate
        a = int(w.start_frame / w.framerate * sr)
        b = int((w.start_frame + self.cfg.clip_frames) / w.framerate * sr)
        return snd[a:b]

    def _bits(self, w: DetectorWindow) -> np.ndarray:
        return np.asarray(w.bits, dtype=np.float32)


class DenoiserBatcher(_BatcherBase):
    """Batches of raw 2 s denoiser clips (m2 dataset windows)."""

    def _clip_samples(self) -> int:
        return self.cfg.clip_seconds * self.cfg.sample_rate

    def _clean_clip(self, w: DenoiserWindow) -> np.ndarray:
        snd = self.cache.get(w.audio_path)
        sr = self.cfg.sample_rate
        return snd[int(w.start_sec * sr):int(w.end_sec * sr)]

    def _bits(self, w: DenoiserWindow) -> np.ndarray:
        return np.asarray([1.0 if c == "1" else 0.0 for c in w.bits],
                          dtype=np.float32)
