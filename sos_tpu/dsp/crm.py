"""Complex ratio mask (cRM) math.

Reproduces the sigmoid-compressed cRM actually used by the reference
(transform.py:36-54, 92-99, 130-169). All functions are batched, jittable
and differentiable — the denoiser's training loss reconstructs the clean
spectrogram in-graph via :func:`apply_compressed_crm` (the reference's
`batch_fast_icRM_sigmoid`, transform.py:156-169).

Layout: spectrograms are `(..., F, T, 2)` with real/imag last.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def complex_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Complex product of two (..., 2) real/imag-packed arrays."""
    ar, ai = a[..., 0], a[..., 1]
    br, bi = b[..., 0], b[..., 1]
    return jnp.stack([ar * br - ai * bi, ar * bi + ai * br], axis=-1)


def complex_ratio_mask(noisy: jnp.ndarray, clean: jnp.ndarray) -> jnp.ndarray:
    """M = clean / noisy in the complex field, eps-regularized.

    Reference `generate_cRM(Y, S)` (transform.py:36-54): M = Y*conj -> the
    real part is (Yr*Sr + Yi*Si)/|Y|^2, imag is (Yr*Si - Yi*Sr)/|Y|^2.
    """
    yr, yi = noisy[..., 0], noisy[..., 1]
    sr, si = clean[..., 0], clean[..., 1]
    denom = yr * yr + yi * yi + _EPS
    m_re = (yr * sr + yi * si) / denom
    m_im = (yr * si - yi * sr) / denom
    return jnp.stack([m_re, m_im], axis=-1)


def crm_sigmoid_compress(m: jnp.ndarray, a: float = 0.1, b: float = 0.0) -> jnp.ndarray:
    """Compress an unbounded cRM into (0, 1) (transform.py:92-94)."""
    return 1.0 / (1.0 + jnp.exp(-a * m + b))


def crm_sigmoid_recover(o: jnp.ndarray, a: float = 0.1, b: float = 0.0) -> jnp.ndarray:
    """Inverse of :func:`crm_sigmoid_compress` (transform.py:97-99).

    Keeps the reference's exact epsilon placement so recovered masks match
    the PyTorch pipeline numerically.
    """
    return 1.0 / a * (jnp.log(o / (1.0 - o + _EPS) + 1e-10) + b)


def crm_tanh_compress(m: jnp.ndarray, k: float = 10.0, c: float = 0.1) -> jnp.ndarray:
    """Hyperbolic-tangent cRM compression into (-K, K) (transform.py:57-74).

    The reference's alternative compression (the shipped pipeline uses the
    sigmoid family); kept for checkpoint/experiment compatibility.
    """
    return k * jnp.tanh(c / 2.0 * m)


def crm_tanh_recover(o: jnp.ndarray, k: float = 10.0, c: float = 0.1) -> jnp.ndarray:
    """Inverse of :func:`crm_tanh_compress` with the reference's epsilons
    (transform.py:77-89)."""
    return -(1.0 / c) * jnp.log((k - o + _EPS) / (k + o + _EPS))


def compressed_crm(clean: jnp.ndarray, noisy: jnp.ndarray) -> jnp.ndarray:
    """Ground-truth compressed cRM (reference `fast_cRM_sigmoid`, transform.py:130-138)."""
    return crm_sigmoid_compress(complex_ratio_mask(noisy, clean))


def compressed_crm_tanh(clean: jnp.ndarray, noisy: jnp.ndarray,
                        k: float = 10.0, c: float = 0.1) -> jnp.ndarray:
    """Tanh-compressed gt cRM (reference `fast_cRM`, transform.py:102-112)."""
    return crm_tanh_compress(complex_ratio_mask(noisy, clean), k, c)


def apply_compressed_crm_tanh(noisy: jnp.ndarray, crm: jnp.ndarray,
                              k: float = 10.0, c: float = 0.1) -> jnp.ndarray:
    """Recover S = tanh_recover(crm) * Y (reference `fast_icRM`, transform.py:115-127)."""
    return apply_mask_complex(noisy, crm_tanh_recover(crm, k, c))


def apply_mask_complex(noisy: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """S = M * Y with (..., 2) real/imag packing."""
    return complex_mul(mask, noisy)


def apply_compressed_crm(noisy: jnp.ndarray, crm: jnp.ndarray,
                         a: float = 0.1, b: float = 0.0) -> jnp.ndarray:
    """Recover the clean spectrogram from a compressed cRM prediction.

    Differentiable batched inverse used inside the stage-2 loss
    (reference `batch_fast_icRM_sigmoid`, transform.py:156-169).
    """
    return apply_mask_complex(noisy, crm_sigmoid_recover(crm, a, b))
