"""sos_tpu — TPU-native framework for "Listening to Sounds of Silence for Speech Denoising".

A ground-up JAX/XLA/Pallas re-design of the two-stage speech-denoising
pipeline from the NeurIPS 2020 paper (reference implementation:
henryxrl/Listening-to-Sound-of-Silence-for-Speech-Denoising):

  Stage 1 — silent-interval detection: dilated 2D CNN + BiLSTM classifier
            over complex spectrograms (per-video-frame silence logits).
  Stage 2 — denoising: silent intervals gate the noisy signal into a
            partial noise observation; an inpainting U-Net predicts the
            full noise spectrogram and a context-aggregation network
            predicts a compressed complex ratio mask (cRM).

TPU-first design notes
----------------------
* STFT/iSTFT are expressed as DFT matmuls + vectorized overlap-add so the
  odd FFT size (n_fft=510) rides the MXU instead of a slow generic FFT.
* The whole inference path (STFT -> detect -> mask -> denoise -> iSTFT) is
  one XLA program (`sos_tpu.infer.fused`).
* SNR mixing + STFT run on-device inside the jitted train step, replacing
  the reference's 60-70 DataLoader worker processes.
* Data parallelism is SPMD over a `jax.sharding.Mesh` (the reference's
  `nn.DataParallel` equivalent), gradients reduced over ICI.
"""

__version__ = "0.1.0"

from sos_tpu import config as config  # noqa: F401
