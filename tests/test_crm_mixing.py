"""cRM identities and SNR-mixing invariants (reference transform.py / tools.py)."""

import numpy as np
import jax.numpy as jnp

from sos_tpu.dsp import (
    apply_compressed_crm,
    apply_mask_complex,
    bitstream_to_sample_mask,
    complex_ratio_mask,
    compressed_crm,
    crm_sigmoid_compress,
    crm_sigmoid_recover,
    mix_at_snr,
)
from sos_tpu.dsp.mixing import (
    bitstream_to_sample_mask_np,
    despeckle_mask_np,
    despeckle_mask,
    mix_at_snr_np,
    filter_bitstream,
    truncate_padding,
)


def test_crm_roundtrip(rng):
    noisy = rng.standard_normal((4, 16, 10, 2)).astype(np.float32)
    clean = rng.standard_normal((4, 16, 10, 2)).astype(np.float32) * 0.5
    crm = compressed_crm(jnp.asarray(clean), jnp.asarray(noisy))
    assert np.all((np.asarray(crm) > 0) & (np.asarray(crm) < 1))
    rec = apply_compressed_crm(jnp.asarray(noisy), crm)
    np.testing.assert_allclose(np.asarray(rec), clean, atol=2e-3, rtol=1e-2)


def test_sigmoid_compress_recover_inverse(rng):
    m = rng.standard_normal((32, 32, 2)).astype(np.float32) * 5
    o = crm_sigmoid_compress(jnp.asarray(m))
    m2 = crm_sigmoid_recover(o)
    np.testing.assert_allclose(np.asarray(m2), m, atol=1e-3, rtol=1e-3)


def test_crm_matches_reference_formula(rng):
    """Elementwise check against the numpy formulas in transform.py:36-54."""
    y = rng.standard_normal((8, 6, 2)).astype(np.float64)
    s = rng.standard_normal((8, 6, 2)).astype(np.float64)
    eps = 1e-8
    sq = y[..., 0] ** 2 + y[..., 1] ** 2
    m_re = (y[..., 0] * s[..., 0] + y[..., 1] * s[..., 1]) / (sq + eps)
    m_im = (y[..., 0] * s[..., 1] - y[..., 1] * s[..., 0]) / (sq + eps)
    ours = np.asarray(complex_ratio_mask(jnp.asarray(y), jnp.asarray(s)))
    np.testing.assert_allclose(ours[..., 0], m_re, atol=1e-5)
    np.testing.assert_allclose(ours[..., 1], m_im, atol=1e-5)


def test_apply_mask_is_complex_product(rng):
    y = rng.standard_normal((5, 5, 2))
    m = rng.standard_normal((5, 5, 2))
    out = np.asarray(apply_mask_complex(jnp.asarray(y), jnp.asarray(m)))
    zc = (y[..., 0] + 1j * y[..., 1]) * (m[..., 0] + 1j * m[..., 1])
    np.testing.assert_allclose(out[..., 0], zc.real, atol=1e-5)
    np.testing.assert_allclose(out[..., 1], zc.imag, atol=1e-5)


def test_mix_at_snr_power_ratio(rng):
    sig = rng.standard_normal(28000).astype(np.float32)
    noise = rng.standard_normal(28000).astype(np.float32) * 3.0
    for snr in (-10.0, 0.0, 7.0):
        mixed, clean, scaled_noise = mix_at_snr(
            jnp.asarray(sig)[None], jnp.asarray(noise)[None], jnp.asarray([snr]))
        p_s = np.sum(np.asarray(clean) ** 2)
        p_n = np.sum(np.asarray(scaled_noise) ** 2)
        measured = 10 * np.log10(p_s / p_n)
        assert abs(measured - snr) < 1e-2
        # joint peak normalization to 0.5 and exact additivity
        assert abs(np.max(np.abs(np.asarray(mixed))) - 0.5) < 1e-5
        np.testing.assert_allclose(
            np.asarray(mixed), np.asarray(clean) + np.asarray(scaled_noise), atol=1e-6)


def test_mix_matches_host_reference(rng):
    sig = rng.standard_normal(4000).astype(np.float64)
    noise = rng.standard_normal(4000).astype(np.float64)
    ref_m, ref_c, ref_n = mix_at_snr_np(sig, noise, 3.0, norm=0.5)
    dev_m, dev_c, dev_n = mix_at_snr(
        jnp.asarray(sig)[None], jnp.asarray(noise)[None], jnp.asarray([3.0]))
    np.testing.assert_allclose(np.asarray(dev_m)[0], ref_m, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dev_c)[0], ref_c, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dev_n)[0], ref_n, atol=1e-5)


def test_zero_signal_mixing(rng):
    """All-silent clip: noise passes through unscaled (reference branch)."""
    noise = rng.standard_normal(1000).astype(np.float32)
    mixed, clean, sn = mix_at_snr(
        jnp.zeros((1, 1000)), jnp.asarray(noise)[None], jnp.asarray([0.0]), norm=None)
    np.testing.assert_allclose(np.asarray(sn)[0], noise, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mixed)[0], noise, atol=1e-6)


def test_bitstream_mask_reference_exact():
    """Mask matches a loop-built oracle with the 1-sample frame-boundary gap."""
    bits = np.array([1, 1, 0, 0, 0, 1, 1, 0, 1, 1], dtype=np.float32)
    ratio = 14000.0 / 30.0
    n = int(len(bits) * ratio)
    # loop oracle (m1 tools.py:770-792 semantics)
    mask = np.zeros(n, dtype=np.float32)
    for b, bit in enumerate(bits):
        lo, hi = int(b * ratio), int((b + 1) * ratio - 1)
        mask[lo:hi] = 1.0 if bit == 0 else 0.0
    oracle = despeckle_mask_np(mask, 5)

    host = bitstream_to_sample_mask_np(bits, ratio, n)
    np.testing.assert_array_equal(host, oracle)

    dev = np.asarray(bitstream_to_sample_mask(jnp.asarray(bits)[None], ratio, n)[0])
    np.testing.assert_array_equal(dev, oracle)


def test_despeckle_flips_short_runs():
    m = np.array([0, 0, 0, 0, 0, 0, 1, 1, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1], dtype=np.float32)
    out = despeckle_mask_np(m, 5)
    expected = m.copy()
    expected[6:8] = 0  # run of 2 ones flips
    # note: the run of 5 zeros at [8:13] stays (len >= 5)
    np.testing.assert_array_equal(out, expected)
    dev = np.asarray(despeckle_mask(jnp.asarray(m)[None], 5)[0])
    np.testing.assert_array_equal(dev, expected)


def test_truncate_and_filter_bitstream():
    assert truncate_padding("2221101222") == (3, 7)
    assert truncate_padding("1101") == (0, 4)
    assert filter_bitstream("110001101", 3) == "110001111"
    assert filter_bitstream("0011", 3) == "1111"


def test_crm_tanh_roundtrip(rng):
    from sos_tpu.dsp.crm import (
        apply_compressed_crm_tanh, compressed_crm_tanh,
        crm_tanh_compress, crm_tanh_recover)

    m = rng.standard_normal((16, 8, 2)).astype(np.float64) * 3
    o = crm_tanh_compress(jnp.asarray(m))
    assert np.all(np.abs(np.asarray(o)) < 10.0)
    m2 = crm_tanh_recover(o)
    np.testing.assert_allclose(np.asarray(m2), m, atol=1e-4, rtol=1e-4)
    # matches the reference's elementwise formulas (transform.py:57-89)
    k_, c_ = 10.0, 0.1
    ref_o = k_ * (1 - np.exp(-c_ * m)) / (1 + np.exp(-c_ * m))
    np.testing.assert_allclose(np.asarray(o), ref_o, atol=1e-6)

    noisy = rng.standard_normal((8, 6, 2))
    clean = rng.standard_normal((8, 6, 2)) * 0.5
    crm = compressed_crm_tanh(jnp.asarray(clean), jnp.asarray(noisy))
    rec = apply_compressed_crm_tanh(jnp.asarray(noisy), crm)
    np.testing.assert_allclose(np.asarray(rec), clean, atol=2e-3, rtol=1e-2)


def test_matmul_despeckle_exact_vs_generic(rng):
    """The fused matmul despeckle (gap matrix) equals the generic
    segment-sum despeckle bit-for-bit over random bitstreams, at the
    production geometry and at off-nominal ones that still satisfy the
    gaps-only invariant."""
    from sos_tpu.dsp.mixing import _despeckle_gap_matrix, frame_sample_matrix

    for num_frames, ratio, num_samples in (
            (60, 14000.0 / 30.0, 28000),   # detector/denoiser clips
            (60, 14000.0 / 30.0, 28003),   # tail longer than the gap
            (30, 14000.0 / 30.0, 14000),   # 1 s clip
            (7, 100.0, 700),               # integer ratio
    ):
        assert _despeckle_gap_matrix(num_frames, num_samples, ratio, 5) \
            is not None, (num_frames, ratio, num_samples)
        for trial in range(8):
            bits = rng.integers(0, 2, (3, num_frames)).astype(np.float32)
            a = frame_sample_matrix(num_frames, num_samples, ratio)
            generic = despeckle_mask(
                jnp.asarray((1.0 - bits) @ a), 5)
            fused = bitstream_to_sample_mask(
                jnp.asarray(bits), ratio, num_samples, 5)
            np.testing.assert_array_equal(np.asarray(fused),
                                          np.asarray(generic),
                                          err_msg=str((num_frames, ratio,
                                                       num_samples, trial)))


def test_matmul_despeckle_falls_back_on_bad_geometry():
    """Frame bodies shorter than min_run break the gaps-only invariant:
    the gap matrix must refuse and the generic path take over."""
    from sos_tpu.dsp.mixing import _despeckle_gap_matrix

    assert _despeckle_gap_matrix(10, 30, 3.0, 5) is None  # body 2 < 5
    # still correct end to end via the generic fallback
    bits = np.array([[1, 0, 1, 0, 0, 1, 1, 0, 1, 1]], dtype=np.float32)
    out = np.asarray(bitstream_to_sample_mask(jnp.asarray(bits), 3.0, 30, 5))
    from sos_tpu.dsp.mixing import bitstream_to_sample_mask_np

    np.testing.assert_array_equal(out[0],
                                  bitstream_to_sample_mask_np(bits[0], 3.0,
                                                              30, 5))


def test_host_mask_matches_dense_matmul(rng):
    """bitstream_to_sample_mask_np's O(num_samples) difference-array
    expansion is bit-exact vs the dense `(1-bits) @ A` construction it
    replaced (full-utterance eval calls it with whole-file lengths, so
    the dense (frames x samples) matrix must never materialize)."""
    from sos_tpu.dsp.mixing import (bitstream_to_sample_mask_np,
                                    despeckle_mask_np, frame_sample_matrix)

    for num_frames, ratio, num_samples, min_run in (
            (60, 14000.0 / 30.0, 28000, 5),
            (7, 13.7, 100, 5),
            (13, 13.0, 177, 3),
            (5, 3.5, 20, 2),
            (1, 466.67, 400, 5),
            (60, 14000.0 / 30.0, 27950, 5),  # clipped final body
    ):
        for _ in range(10):
            bits = rng.integers(0, 2, num_frames).astype(np.float32)
            got = bitstream_to_sample_mask_np(bits, ratio, num_samples,
                                              min_run)
            a = frame_sample_matrix(num_frames, num_samples, ratio)
            want = despeckle_mask_np((1.0 - bits) @ a, min_run)
            np.testing.assert_array_equal(
                got, want, err_msg=str((num_frames, ratio, num_samples)))


def test_device_mask_gather_path_matches_matmul(rng, monkeypatch):
    """Above _DENSE_MASK_MAX_ELEMS the device mask switches to O(samples)
    gather maps (full-utterance buckets: a 60 s bucket's dense matrix
    would be ~6 GB); the gather formulation must equal the dense matmul
    bit-for-bit, including the despeckle gap terms and the generic
    fallback geometry."""
    import sos_tpu.dsp.mixing as mixing

    for num_frames, ratio, num_samples, min_run in (
            (60, 14000.0 / 30.0, 28000, 5),
            (7, 13.7, 100, 5),
            (13, 13.0, 177, 3),
            (5, 3.5, 20, 2),       # gap matrix refuses: generic fallback
            (60, 14000.0 / 30.0, 27950, 5),
            (60, 14000.0 / 30.0, 28000, 1),  # despeckle disabled
    ):
        bits = rng.integers(0, 2, (4, num_frames)).astype(np.float32)
        monkeypatch.setattr(mixing, "_DENSE_MASK_MAX_ELEMS", 0)
        got = np.asarray(mixing.bitstream_to_sample_mask(
            jnp.asarray(bits), ratio, num_samples, min_run))
        monkeypatch.setattr(mixing, "_DENSE_MASK_MAX_ELEMS", 10 ** 15)
        want = np.asarray(mixing.bitstream_to_sample_mask(
            jnp.asarray(bits), ratio, num_samples, min_run))
        np.testing.assert_array_equal(
            got, want, err_msg=str((num_frames, ratio, num_samples, min_run)))
