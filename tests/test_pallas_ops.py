"""Pallas kernel correctness (interpret mode on the CPU mesh).

The compiled-on-TPU path is exercised by bench tooling; these tests pin
the kernel's math against the jnp reference implementation.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sos_tpu.dsp.stft import stft
from sos_tpu.ops.pallas_stft import stft_pallas


@pytest.mark.parametrize("shape", [(2, 28000), (1, 14000), (3, 40000)])
def test_stft_pallas_matches_jnp(rng, shape):
    y = rng.standard_normal(shape).astype(np.float32) * 0.3
    ours = np.asarray(stft_pallas(jnp.asarray(y), interpret=True))
    ref = np.asarray(stft(jnp.asarray(y)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=5e-5, rtol=1e-4)


def test_stft_pallas_1d_input(rng):
    y = rng.standard_normal(20000).astype(np.float32)
    out = np.asarray(stft_pallas(jnp.asarray(y), interpret=True))
    assert out.shape == (1, 256, 1 + 20000 // 158, 2)
