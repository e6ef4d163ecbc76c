"""Long-form streaming denoise: chunked inference with overlap-add crossfade.

The reference processes whole utterances in one pass (unbounded memory in
T). For long-form audio (BASELINE.json config[4]: 60 s+), this module
slices the waveform into fixed-size chunks (so ONE compiled program
serves any duration), batches them through the fused pipeline, and
overlap-adds the results with triangular crossfades. Chunking also bounds
the BiLSTM's sequential depth, keeping the scan short and the MXU busy
across the chunk batch dimension.

Length contract (pinned by
tests/test_infer.py::test_streaming_length_contract_geometry_sweep): a
multi-chunk utterance returns exactly its input length; an utterance
that fits ONE chunk returns min(n, valid) samples, where valid =
floor(chunk/hop)*hop is the iSTFT's valid span — i.e. an input in
(valid, chunk] loses its final < hop samples (2.4 ms at the nominal
2 s / 14 kHz geometry). The whole-utterance predictors
(infer/denoise.py) are not subject to this; it is the price of the
fixed-size chunk program.

Boundary consistency (deviation from the whole-utterance reference,
handled explicitly): with naive per-chunk detection, a silent interval
straddling a chunk boundary can be classified differently by the two
chunks that see it, gating different noise observations on the two sides
of the crossfade. In the default `consistent_boundaries` mode the
pipeline runs in two passes — detect ALL chunks first, then reconcile
bits across overlaps with a most-interior-decision-wins rule (a frame in
the leading half of chunk i+1's overlap takes chunk i's decision for the
same absolute time, where chunk i saw it with full left context) — and
only then denoises with the reconciled bits, so both sides of every
crossfade gate the same silence decisions.

Geometry guidance (measured on trained checkpoints, 40-clip corpus,
docs/EXPERIMENTS.md "streamed-vs-whole" sections): at moderate SNR
(0 dB) every geometry from 2 s/0.5 s up is metric-neutral vs
whole-utterance denoising (|dPESQ| <= 0.0032). At very low SNR
(-10 dB) the models need more temporal context than a 2 s chunk
provides (two-pass dPESQ -0.053, dSTOI -0.012); `chunk_seconds=6.0,
overlap_seconds=1.0` restores parity (two-pass dPESQ -0.009, dSTOI
+0.0003). For material expected below ~-5 dB SNR, prefer >= 6 s chunks
and keep the default two-pass `consistent_boundaries`. The
`detector_context_seconds` halo buys back only ~a quarter of the gap
(detection's share; the rest is denoiser receptive field) but costs no
latency — see its parameter docstring.
"""

from __future__ import annotations

from collections import deque
from typing import Dict

import numpy as np
import jax.numpy as jnp

from sos_tpu.config import ExperimentConfig
from sos_tpu.infer.fused import FusedDenoisePipeline


class StreamingDenoiser:
    def __init__(self, cfg: ExperimentConfig, detector_vars: Dict,
                 denoiser_vars: Dict, chunk_seconds: float = 2.0,
                 overlap_seconds: float = 0.5, batch_chunks: int = 16,
                 threshold: float = 0.5, compute_dtype: str = "float32",
                 consistent_boundaries: bool = True, profile: str = None,
                 calibration_path: str = None,
                 transfer_dtype: str = "float32",
                 pipeline_depth: int = 2, bf16_head_proj: bool = True,
                 detector_context_seconds: float = None):
        """`transfer_dtype="int16"` ships waveform chunks to the device
        and denoised audio back as int16 wire samples (fused.py wire
        format): HALF the transfer bytes each way — the dominant serving
        cost on remote/tunneled TPUs (docs/ROADMAP.md). Lossless on
        input for unresampled 16-bit PCM sources (their floats are
        exact multiples of 1/32768); the output delta vs float32
        transfer is the int16 LSB plus float-rounding drift (XLA fuses
        the dequant scale into the STFT matmul) with rare
        near-threshold detection flips — the same drift class as the
        bf16/int8 profiles, bounded in tests/test_infer.py. Output
        samples past full scale clamp to [-1, 32767/32768], exactly as
        audio_io.write_wav's 16-bit PCM encode would clip them anyway.
        Note the clamp applies on INPUT too: over-unity input floats
        (non-PCM sources above full scale) are hard-clipped to
        [-1, 32767/32768] by the wire encode before the STFT ever sees
        them — use the default float32 transfer for such material.
        The API still takes/returns float32 waveforms.

        `pipeline_depth`: how many chunk-batch dispatches may be in
        flight on the device at once (see `_batched_async`). Depth 2 is
        enough to overlap bucket N+1's host->device transfer with
        bucket N's compute; each extra unit of depth holds one more
        input+output bucket in HBM (~30 MB at the nominal geometry).

        `detector_context_seconds` (two-pass mode only): total window
        the DETECTOR sees per chunk. When > chunk_seconds, detection
        windows prepend `detector_context_seconds - chunk_seconds` of
        real left context (zeros before the utterance head) and the
        leading context frames are cropped before reconciliation — the
        denoiser still runs on chunk_seconds chunks, so latency and the
        compiled denoise program are unchanged, at the cost of detector
        FLOPs only (~12% of the fused program per context multiple).
        Measured at -10 dB on trained checkpoints (docs/EXPERIMENTS.md):
        a 6 s detector context on 2 s chunks narrows the streamed-PESQ
        gap ~25% (-0.053 -> -0.040) but does NOT restore parity — most
        of the short-chunk deficit is DENOISER context, so prefer
        chunk_seconds >= 6 when latency allows (module-docstring
        geometry guidance). Must satisfy: the context excess is a whole
        number of detector frames AND samples (multiples of 0.1 s at
        the reference 14 kHz / 30 fps rates)."""
        if transfer_dtype not in ("float32", "int16"):
            raise ValueError(f"transfer_dtype must be float32|int16, "
                             f"got {transfer_dtype!r}")
        self.transfer_dtype = transfer_dtype
        self.cfg = cfg
        self.pipeline = FusedDenoisePipeline(
            cfg, detector_vars, denoiser_vars, threshold=threshold,
            clip_seconds=chunk_seconds, compute_dtype=compute_dtype,
            profile=profile, calibration_path=calibration_path,
            wire_dtype=transfer_dtype, bf16_head_proj=bf16_head_proj)
        sr = cfg.data.sample_rate
        hop = cfg.stft.hop_length
        self.chunk = self.pipeline.clip_samples
        # iSTFT yields floor(L/hop)*hop samples per chunk
        self.valid = (self.chunk // hop) * hop
        self.overlap = int(overlap_seconds * sr)
        # the overlap is bounded by HALF the iSTFT-valid span
        # (< chunk_seconds because iSTFT yields floor(L/hop)*hop
        # samples): beyond that, 3+ chunks cover one sample, the
        # crossfade ramps stop being complementary, and reconcile_bits'
        # pairwise boundary consistency no longer covers every blend —
        # both invariants this class is built on
        assert 0 <= 2 * self.overlap <= self.valid, (
            f"overlap_seconds={overlap_seconds} must satisfy "
            f"0 <= overlap <= {self.valid / (2 * sr):.4f}s (half the "
            f"iSTFT-valid span of a {chunk_seconds}s chunk, so every "
            "sample is covered by at most two chunks)")
        self.stride = self.valid - self.overlap
        self.batch_chunks = batch_chunks
        self.consistent_boundaries = consistent_boundaries
        assert pipeline_depth >= 1, pipeline_depth
        self.pipeline_depth = pipeline_depth
        # detector-context halo (left context, two-pass mode only)
        ctx = detector_context_seconds
        if ctx is None or ctx == chunk_seconds:
            self.det_halo = 0
            self.det_halo_frames = 0
        else:
            if not consistent_boundaries:
                raise ValueError(
                    "detector_context_seconds requires the two-pass "
                    "consistent_boundaries mode (one-pass denoising is "
                    "a single fused program with no separate detect)")
            if ctx < chunk_seconds:
                raise ValueError(
                    f"detector_context_seconds={ctx} must be >= "
                    f"chunk_seconds={chunk_seconds}")
            halo_s = ctx - chunk_seconds
            fps = cfg.data.frame_rate
            halo_frames = halo_s * fps
            halo_samples = halo_s * sr
            if (abs(halo_frames - round(halo_frames)) > 1e-6
                    or abs(halo_samples - round(halo_samples)) > 1e-6):
                raise ValueError(
                    f"detector context excess {halo_s}s must be a whole "
                    f"number of detector frames (x{fps}/s) and samples "
                    f"(x{sr}/s) so context frames crop exactly")
            self.det_halo = int(round(halo_samples))
            self.det_halo_frames = int(round(halo_frames))

    def _det_windows(self, wav: np.ndarray, starts) -> np.ndarray:
        """Detector-halo windows: chunk i's window covers
        [start_i - det_halo, start_i + chunk), zero-padded outside the
        utterance (zeros before the head — the same no-context stimulus
        the first chunk gets today — and the zero tail the chunk itself
        is padded with)."""
        halo = self.det_halo
        out = np.zeros((len(starts), halo + self.chunk), dtype=np.float32)
        for i, s in enumerate(starts):
            lo = s - halo
            seg = wav[max(0, lo): s + self.chunk]
            dst = max(0, -lo)
            out[i, dst: dst + len(seg)] = seg
        return out

    def _weights(self) -> np.ndarray:
        w = np.ones(self.valid, dtype=np.float32)
        if self.overlap == 0:
            return w  # no crossfade: chunks abut exactly
        # Center the ramp on the half-sample grid so every position keeps
        # a strictly positive weight: a 0-weight at the very first sample
        # has nothing to normalize against (wsum == 0 there) and would
        # force output[0] to 0 on every multi-chunk utterance. Aligned
        # leading/trailing pairs still sum to exactly 1.
        ramp = ((np.arange(self.overlap) + 0.5) / self.overlap).astype(
            np.float32)
        w[: self.overlap] = ramp
        w[-self.overlap:] = ramp[::-1]
        return w

    def denoise(self, waveform: np.ndarray) -> np.ndarray:
        """Denoise arbitrary-length audio at the processing sample rate."""
        return self.denoise_many([waveform])[0]

    def warmup(self, max_width: int = None) -> list:
        """Precompile the dispatch-bucket programs for every power-of-two
        chunk-batch width up to `max_width` (default: batch_chunks), so a
        live server never stalls tens of seconds on first-use compilation
        mid-traffic (measured: a cold 64-request burst spends ~95% of its
        wall in width-2/4 compiles — experiments/serve_throughput.py).

        Warms the fused one-pass program and, in consistent-boundaries
        mode, the detect/denoise pair as well. int8 profiles are only
        warmed when calibration scales are final (persisted file present
        or already calibrated): calibration re-folds the int8 weights,
        which would retrace everything warmed before it. Returns the
        warmed widths ([] when skipped)."""
        if not self.pipeline.ensure_calibrated():
            import logging
            logging.getLogger(__name__).warning(
                "warmup skipped: int8 profile has no calibration scales "
                "yet (no persisted file) — the first real request will "
                "calibrate and compile")
            return []
        cap = max_width or self.batch_chunks
        widths, w = [], 1
        while w < cap:
            widths.append(w)
            w *= 2
        # full batches dispatch at exactly batch_chunks, which need not
        # be a power of two — warm that width too
        widths.append(cap)
        rng = np.random.default_rng(0)
        for w in widths:
            chunks = (rng.standard_normal((w, self.chunk)) * 0.01).astype(
                np.float32)
            if self.consistent_boundaries:
                det_in = chunks if not self.det_halo else np.concatenate(
                    [np.zeros((w, self.det_halo), np.float32), chunks],
                    axis=1)
                bits = self._batched(self.pipeline.detect_bits, [det_in])
                bits = np.asarray(bits,
                                  np.float32)[:, self.det_halo_frames:]
                self._batched(self.pipeline.denoise_with_bits,
                              [chunks, bits])
            self._one_pass(chunks)
        return widths

    def denoise_many(self, waveforms) -> list:
        """Denoise several utterances, batching their chunks into SHARED
        device dispatches — short requests no longer waste a mostly-empty
        chunk batch each (cross-request batching for the serve loop).
        Per-utterance outputs are identical to `denoise` one at a time:
        chunking, bit reconciliation and overlap-add stay per-utterance.
        """
        return self.denoise_many_async(waveforms)()

    def denoise_many_async(self, waveforms):
        """Dispatch `denoise_many` WITHOUT waiting; returns a
        `finalize() -> [wav, ...]` callable that blocks for the results.

        The dispatch side only ENQUEUES device work (JAX async dispatch
        — see `_batched_async`), so a caller can overlap the blocking
        fetch + host overlap-add of request batch N with the dispatch of
        batch N+1 by running `finalize` on another thread (the serve
        loop's writer does exactly that). `finalize` must be called
        exactly once; calling it from a different thread than the
        dispatch is safe (compiled-program execution is thread-safe in
        JAX)."""
        if not waveforms:
            return lambda: []
        slices = []  # (start_row, starts, n) per utterance
        all_chunks = []
        row = 0
        for wav in waveforms:
            n = len(wav)
            # same chunk layout as the original single-utterance path:
            # one chunk when the utterance fits, else stride-spaced
            starts = [0] if n <= self.chunk else list(
                range(0, n, self.stride))
            chunks = np.zeros((len(starts), self.chunk), dtype=np.float32)
            for i, s in enumerate(starts):
                seg = wav[s:s + self.chunk]
                chunks[i, : len(seg)] = seg
            all_chunks.append(chunks)
            slices.append((row, starts, n))
            row += len(starts)
        stacked = np.concatenate(all_chunks, axis=0)

        # Reconciliation is a no-op when every utterance fits one chunk,
        # so the fused single-dispatch program (detector and denoiser
        # sharing ONE mixed STFT) serves that case — the common short
        # request in the serve loop keeps its one-dispatch latency, and
        # _batched pads it only to the next power-of-two bucket (width 1
        # for a lone request), not to the full batch_chunks width.
        all_single = all(len(starts) == 1 for _, starts, _ in slices)
        if self.consistent_boundaries and not all_single:
            # two-pass: the detect dispatch goes out now; the bits fetch,
            # host reconciliation, denoise dispatch+fetch and overlap-add
            # all wait inside finalize (reconciliation is a host step, so
            # the second pass cannot be enqueued before the first lands)
            if self.det_halo:
                det_stacked = np.concatenate(
                    [self._det_windows(wav, sl[1])
                     for wav, sl in zip(waveforms, slices)], axis=0)
            else:
                det_stacked = stacked
            detect_fin = self._batched_async(self.pipeline.detect_bits,
                                             [det_stacked])

            def finalize():
                bits = detect_fin()
                if self.det_halo_frames:  # crop the left-context frames
                    bits = np.ascontiguousarray(
                        bits[:, self.det_halo_frames:])
                for r, starts, _ in slices:
                    bits[r:r + len(starts)] = self.reconcile_bits(
                        bits[r:r + len(starts)], starts)
                denoised = self._batched(self.pipeline.denoise_with_bits,
                                         [stacked, bits])
                return self._assemble(denoised, slices)
        else:
            fin = self._batched_async(lambda m: self.pipeline(m)[0],
                                      [stacked])

            def finalize():
                return self._assemble(fin(), slices)

        return finalize

    def _assemble(self, denoised: np.ndarray, slices) -> list:
        """Per-utterance crossfade/trim of the stacked denoised chunks."""
        w = self._weights()
        outs = []
        for r, starts, n in slices:
            chunks_out = denoised[r:r + len(starts)]
            if len(starts) == 1:
                outs.append(np.asarray(chunks_out[0])[: min(n, self.valid)])
                continue
            total = starts[-1] + self.valid
            acc = self._overlap_add(chunks_out * w, total)
            wsum = self._overlap_add(
                np.broadcast_to(w, chunks_out.shape), total)
            nz = wsum > 1e-8
            acc[nz] /= wsum[nz]
            outs.append(acc[:n])
        return outs

    def _overlap_add(self, weighted: np.ndarray, total: int) -> np.ndarray:
        """Vectorized overlap-add: chunk i occupies [i*stride, i*stride+valid).

        Decompose each chunk into K = ceil(valid/stride) stride-aligned
        phase blocks; phase p of chunk i lands exactly on output block
        i+p, so the whole accumulation is K whole-utterance vector adds
        instead of a per-chunk Python loop (K == 2 for the default
        2 s / 0.5 s chunking)."""
        n_chunks = len(weighted)
        k = -(-self.valid // self.stride)
        padded = np.zeros((n_chunks, k * self.stride), dtype=np.float32)
        padded[:, : self.valid] = weighted
        blocks = padded.reshape(n_chunks, k, self.stride)
        acc = np.zeros((n_chunks + k - 1, self.stride), dtype=np.float32)
        for p in range(k):
            acc[p : p + n_chunks] += blocks[:, p, :]
        return acc.reshape(-1)[:total]

    # ------------------------------------------------------------------

    def _batched(self, fn, arrays):
        """Run `fn` over fixed-size chunk batches; blocks for the result.
        See `_batched_async` for the batching/pipelining rules."""
        return self._batched_async(fn, arrays)()

    def _batched_async(self, fn, arrays):
        """Dispatch `fn` over fixed-size chunk batches without waiting;
        returns `finalize() -> stacked results`.

        Bucketing: a partial batch (the tail, or a short request smaller
        than ``batch_chunks``) pads only to the next power of two, not
        to the full width — so the serve loop's common case, ONE 2 s
        chunk, dispatches a width-1 program instead of paying a
        mostly-empty ``batch_chunks``-wide batch. Bucketing bounds
        recompilation to log2(batch_chunks) program shapes, each cached
        after first use.

        Pipelining: JAX dispatch is asynchronous — `jnp.asarray` (H2D)
        and the jitted `fn` call only enqueue work — so bucket N+1's
        transfer+compute is enqueued BEFORE bucket N's blocking D2H
        fetch, overlapping transfer with compute instead of the old
        strictly sequential encode -> dispatch -> fetch per bucket. At
        most `pipeline_depth` dispatches are kept in flight (the oldest
        is fetched when the window fills), bounding device memory; the
        remaining fetches happen in `finalize`, typically on another
        thread while the caller dispatches more work."""
        if self.transfer_dtype == "int16":
            # Only f32 waveform chunks take the wire encode; later arrays
            # (reconciled bits) stay float32. Enforced, not assumed: a
            # call site passing bits or pre-encoded data first would be
            # silently corrupted by a second encode.
            assert (arrays[0].dtype == np.float32
                    and arrays[0].shape[-1] in (
                        self.chunk, self.chunk + self.det_halo)), (
                "wire encode expects f32 waveform chunks (or detector-"
                "halo windows) first, got "
                f"{arrays[0].dtype} {arrays[0].shape}")
            from sos_tpu.infer.fused import wire_encode

            arrays = [wire_encode(arrays[0]), *arrays[1:]]
        n = len(arrays[0])
        outs = []
        pending = deque()  # (device result, real rows) FIFO

        def _fetch_one():
            out, real = pending.popleft()
            outs.append(np.asarray(out)[:real])

        for b in range(0, n, self.batch_chunks):
            tiles = [a[b:b + self.batch_chunks] for a in arrays]
            real = len(tiles[0])
            width = min(self.batch_chunks, 1 << (real - 1).bit_length())
            if real < width:
                tiles = [np.concatenate(
                    [t, np.zeros((width - real,) + t.shape[1:],
                                 dtype=t.dtype)]) for t in tiles]
            pending.append((fn(*[jnp.asarray(t) for t in tiles]), real))
            while len(pending) > self.pipeline_depth:
                _fetch_one()

        def finalize():
            while pending:
                _fetch_one()
            result = np.concatenate(outs, axis=0)
            if result.dtype == np.int16:  # wire-format denoised audio
                from sos_tpu.infer.fused import wire_decode

                result = wire_decode(result)
            return result

        return finalize

    def _one_pass(self, chunks: np.ndarray) -> np.ndarray:
        return self._batched(lambda m: self.pipeline(m)[0], [chunks])

    def reconcile_bits(self, bits: np.ndarray, starts) -> np.ndarray:
        """Most-interior-decision-wins bit reconciliation across overlaps.

        The sync is TWO-WAY so both sides of every crossfade gate the same
        decisions over the WHOLE overlap, each half owned by the chunk
        that saw it with more interior context:

        * leading half of the overlap: chunk i adopts chunk i-1's decision
          (chunk i-1 saw those samples with full left context, chunk i
          with none);
        * trailing half: chunk i-1 adopts chunk i's decision (those
          samples sit closer to chunk i-1's right edge than to chunk i's
          left edge, so chunk i is the more interior observer).

        Frame centers are matched to the nearest absolute-time center
        (chunk strides need not be whole frames), so agreement is exact
        up to that rounding.
        """
        sr = self.cfg.data.sample_rate
        fps = self.cfg.data.frame_rate
        bits = bits.copy()
        num_frames = bits.shape[1]
        centers = (np.arange(num_frames) + 0.5) / fps  # chunk-local seconds
        half_ov = 0.5 * self.overlap / sr
        ov = self.overlap / sr
        for i in range(1, len(starts)):
            delta = (starts[i] - starts[i - 1]) / sr  # chunk offset, seconds
            lead = centers < half_ov
            prev_idx = np.round((centers + delta) * fps - 0.5).astype(int)
            ok = lead & (prev_idx >= 0) & (prev_idx < num_frames)
            bits[i, np.nonzero(ok)[0]] = bits[i - 1, prev_idx[ok]]
            # chunk i-1's frames in the trailing half of the overlap
            # ([delta+half_ov, delta+ov) in i-1-local time) adopt chunk
            # i's (own, un-replaced: local centers >= half_ov) decision
            trail = (centers >= delta + half_ov) & (centers < delta + ov)
            next_idx = np.round((centers - delta) * fps - 0.5).astype(int)
            ok = trail & (next_idx >= 0) & (next_idx < num_frames)
            bits[i - 1, np.nonzero(ok)[0]] = bits[i, next_idx[ok]]
        return bits


class StreamingSession:
    """TRUE incremental streaming: push audio in, pull finalized audio out.

    `StreamingDenoiser.denoise` needs the whole waveform up front; this
    session consumes arbitrary-size sample pushes and emits denoised
    audio as soon as every chunk covering it is final, with bounded
    memory (carried context is O(chunk + detector context halo)) and
    bounded latency — the detector-context halo looks BACK only, so it
    adds detector context without adding a single sample of latency
    (it narrows but does not close the low-SNR short-chunk gap; see
    the StreamingDenoiser docstring).

    Equality contract (pinned by tests/test_infer.py): the concatenation
    of every `push()` return plus `flush()` equals
    `StreamingDenoiser.denoise(full_waveform)` on the same audio to
    within float32 rounding (measured max 5e-7: the session dispatches
    chunks at width 1 while the offline path batches them into
    power-of-2 buckets, which perturbs XLA reductions at the ulp level;
    single-chunk streams delegate to the identical offline call and
    match bitwise). The session replays the offline path's exact
    chunking, two-way bit reconciliation and crossfade arithmetic
    incrementally:

    * a chunk is detected once its full window has been pushed;
    * detecting chunk k finalizes chunk k-1's bits (the offline
      reconciliation is strictly pairwise — guaranteed by the
      2*overlap <= valid invariant — and chunk k-1's trailing-half
      adoption is the only edit that waits on chunk k);
    * chunk k-1 is then denoised and crossfaded into the carry
      accumulator, finalizing all samples before k*stride (every
      sample is covered by at most two chunks, and float addition of
      two terms is order-independent, so the incremental accumulation
      is bitwise the offline one);
    * `flush()` zero-pads and processes the tail chunks exactly like
      the offline layout (single-chunk utterances take the offline
      one-dispatch fused path verbatim).

    Worst-case latency: a pushed sample is emitted after at most
    `chunk + 2*stride` further samples arrive (or at flush) — 5 s of
    audio at the nominal 2 s chunk / 0.5 s overlap geometry. In naive
    mode (`consistent_boundaries=False`) there is no cross-chunk bit
    dependency: each full window denoises immediately in one fused
    dispatch and the bound drops to `chunk + stride` (3.5 s nominal).
    """

    def __init__(self, denoiser: StreamingDenoiser):
        self.d = denoiser
        self.chunk = denoiser.chunk
        self.stride = denoiser.stride
        self.valid = denoiser.valid
        self._w = denoiser._weights()
        self._buf = np.zeros(0, dtype=np.float32)  # samples >= _base
        self._base = 0            # absolute index of _buf[0]
        self._n = 0               # total samples pushed
        self._pending_bits = []   # raw bits, chunks [_next_den.._next_det)
        self._next_det = 0        # next chunk index to detect
        self._next_den = 0        # next chunk index to denoise
        self._acc = np.zeros(0, dtype=np.float32)   # crossfade carry
        self._wsum = np.zeros(0, dtype=np.float32)  # from _emit onward
        self._emit = 0            # absolute index of next sample to emit
        self._finished = False

    # -- internal ----------------------------------------------------------

    def _chunk_wave(self, k: int) -> np.ndarray:
        s = k * self.stride - self._base
        seg = self._buf[s: s + self.chunk]
        if len(seg) < self.chunk:  # flush-time tail: zero-pad
            seg = np.concatenate(
                [seg, np.zeros(self.chunk - len(seg), np.float32)])
        return seg

    def _det_wave(self, k: int) -> np.ndarray:
        """Chunk k's detector window [k*stride - det_halo, k*stride +
        chunk): the chunk plus its left-context halo, zero-padded before
        absolute sample 0 and at the flush-time tail (the same stimulus
        the offline `_det_windows` builds)."""
        halo = self.d.det_halo
        lo = k * self.stride - halo  # absolute window start, may be < 0
        out = np.zeros(halo + self.chunk, np.float32)
        a = max(lo, 0)
        seg = self._buf[a - self._base:
                        k * self.stride + self.chunk - self._base]
        out[a - lo: a - lo + len(seg)] = seg
        return out

    def _detect(self, k: int) -> None:
        wave = self._det_wave(k) if self.d.det_halo else self._chunk_wave(k)
        bits = self.d._batched(self.d.pipeline.detect_bits, [wave[None]])
        self._pending_bits.append(
            np.asarray(bits[0], np.float32)[self.d.det_halo_frames:])
        self._next_det = k + 1
        if k > 0:
            # pairwise reconcile (k-1, k): finalizes k-1's bits, edits
            # k's leading half — same rule/order as reconcile_bits
            i = k - self._next_den  # local index of chunk k
            pair = np.stack([self._pending_bits[i - 1],
                             self._pending_bits[i]])
            pair = self.d.reconcile_bits(
                pair, [(k - 1) * self.stride, k * self.stride])
            self._pending_bits[i - 1] = pair[0]
            self._pending_bits[i] = pair[1]

    def _denoise_next(self) -> None:
        """Denoise chunk _next_den into the carry (consistent mode: with
        its finalized reconciled bits; naive mode: one fused dispatch,
        no separate detect)."""
        k = self._next_den
        wave = self._chunk_wave(k)
        if self.d.consistent_boundaries:
            out = self.d._batched(
                self.d.pipeline.denoise_with_bits,
                [wave[None], self._pending_bits.pop(0)[None]])[0]
        else:
            out = self.d._one_pass(wave[None])[0]
        self._next_den = k + 1
        # grow the carry to cover [emit_abs, k*stride + valid)
        start = k * self.stride
        end = start + self.valid
        acc_abs = self._emit
        need = end - acc_abs
        if len(self._acc) < need:
            pad = need - len(self._acc)
            self._acc = np.concatenate([self._acc,
                                        np.zeros(pad, np.float32)])
            self._wsum = np.concatenate([self._wsum,
                                         np.zeros(pad, np.float32)])
        lo = start - acc_abs
        self._acc[lo: lo + self.valid] += np.asarray(out,
                                                     np.float32) * self._w
        self._wsum[lo: lo + self.valid] += self._w
        # drop consumed input samples: chunk k+1 starts at (k+1)*stride,
        # and its detector window reaches det_halo samples further back
        new_base = max(0, (k + 1) * self.stride - self.d.det_halo)
        if new_base > self._base:
            self._buf = self._buf[new_base - self._base:]
            self._base = new_base

    def _take(self, upto_abs: int) -> np.ndarray:
        """Normalize + emit carry samples in [_emit, upto_abs)."""
        m = upto_abs - self._emit
        if m <= 0:
            return np.zeros(0, np.float32)
        out = self._acc[:m].copy()
        ws = self._wsum[:m]
        nz = ws > 1e-8
        out[nz] /= ws[nz]
        self._acc = self._acc[m:]
        self._wsum = self._wsum[m:]
        self._emit = upto_abs
        return out

    # -- public ------------------------------------------------------------

    def push(self, samples: np.ndarray) -> np.ndarray:
        """Feed more audio; returns newly FINAL denoised samples
        (possibly empty). Concatenated pushes+flush == offline denoise."""
        assert not self._finished, "push() after flush()"
        samples = np.asarray(samples, dtype=np.float32).reshape(-1)
        self._buf = np.concatenate([self._buf, samples])
        self._n += len(samples)
        # Consistent mode: detect every chunk whose full window is in;
        # denoise each chunk whose bits are final (detected + reconciled
        # with its successor). Naive mode: no cross-chunk dependency —
        # denoise each full window immediately (one fused dispatch per
        # chunk, latency bound drops to chunk + stride). Either way the
        # single-chunk offline fast path means nothing can be emitted
        # until the stream provably has >= 2 chunks.
        if self.d.consistent_boundaries:
            while self._next_det * self.stride + self.chunk <= self._n:
                self._detect(self._next_det)
                if self._next_det >= 2:  # chunk _next_det-2 is final
                    self._denoise_next()
        else:
            while self._next_den * self.stride + self.chunk <= self._n:
                if self._next_den == 0 and self._n <= self.chunk:
                    break  # could still be a single-chunk stream
                self._denoise_next()
        if self._next_den == 0:
            return np.zeros(0, np.float32)
        return self._take(self._next_den * self.stride)

    def flush(self) -> np.ndarray:
        """End of stream: process tail chunks, return remaining audio.
        Total emitted across the session == len(pushed audio) (offline
        length contract; a single-chunk stream returns min(n, valid))."""
        assert not self._finished, "flush() twice"
        self._finished = True
        n = self._n
        if n == 0:
            return np.zeros(0, np.float32)
        if n <= self.chunk and self._next_den == 0 and self._next_det <= 1:
            # offline single-chunk layout: one fused dispatch, no
            # crossfade (denoise_many's all_single fast path). _base is
            # still 0 here (it only advances after a _denoise_next), so
            # _buf holds exactly the n pushed samples.
            return self.d.denoise(self._buf)
        # remaining chunk starts: every k*stride < n (offline layout)
        if self.d.consistent_boundaries:
            while self._next_det * self.stride < n:
                self._detect(self._next_det)
            while self._next_den < self._next_det:
                self._denoise_next()
        else:
            while self._next_den * self.stride < n:
                self._denoise_next()
        return self._take(n)
