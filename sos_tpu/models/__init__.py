"""Model zoo: silent-interval detector and joint denoiser (flax).

Layout convention throughout: spectrogram "images" are NHWC
`(B, F, T, C)` — frequency as H, time as W, real/imag (or features) as C.
The reference uses NCHW `(B, C, F, T)`; kernel/dilation tuples `(kF, kT)`
carry over unchanged.
"""

from sos_tpu.models.detector import SilenceDetector  # noqa: F401
from sos_tpu.models.denoiser import InpaintNet, ContextAggNet, JointDenoiser  # noqa: F401
