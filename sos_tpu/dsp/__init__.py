"""DSP substrate: STFT/iSTFT, complex-ratio-mask math, SNR mixing, resampling.

Fidelity-critical: these reproduce the reference's librosa conventions
(transform.py:6-8,188-202) so spectrograms and reconstructions are
comparable bit-for-bit (up to float tolerance) with the PyTorch pipeline.
"""

from sos_tpu.dsp.stft import stft, istft, stft_1d, istft_1d  # noqa: F401
from sos_tpu.dsp.crm import (  # noqa: F401
    complex_ratio_mask,
    crm_sigmoid_compress,
    crm_sigmoid_recover,
    compressed_crm,
    apply_compressed_crm,
    apply_mask_complex,
)
from sos_tpu.dsp.mixing import (  # noqa: F401
    signal_power,
    mix_at_snr,
    bitstream_to_sample_mask,
    despeckle_mask,
)
