"""Unit tests: BiLSTM vs torch.nn.LSTM, resize vs F.interpolate, utils."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from sos_tpu.data.sampling import NoiseBank
from sos_tpu.ops.lstm import BiLSTM
from sos_tpu.ops.resize import nearest_resize_1d
from sos_tpu.utils import AverageMeter, cycle


def test_bilstm_matches_torch(rng):
    torch.manual_seed(2)
    c, h, t, b = 12, 5, 9, 3
    ref = torch.nn.LSTM(input_size=c, hidden_size=h, bidirectional=True)
    x = rng.standard_normal((b, t, c)).astype(np.float32)
    with torch.no_grad():
        want, _ = ref(torch.from_numpy(x.transpose(1, 0, 2)))
    want = want.numpy().transpose(1, 0, 2)  # (B, T, 2H)

    model = BiLSTM(hidden=h)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {
        "w_ih_fwd": sd["weight_ih_l0"].T,
        "w_hh_fwd": sd["weight_hh_l0"].T,
        "b_ih_fwd": sd["bias_ih_l0"],
        "b_hh_fwd": sd["bias_hh_l0"],
        "w_ih_bwd": sd["weight_ih_l0_reverse"].T,
        "w_hh_bwd": sd["weight_hh_l0_reverse"].T,
        "b_ih_bwd": sd["bias_ih_l0_reverse"],
        "b_hh_bwd": sd["bias_hh_l0_reverse"],
    }
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("in_len,out_len", [(178, 60), (60, 178), (7, 7), (5, 13)])
def test_nearest_resize_matches_torch(rng, in_len, out_len):
    x = rng.standard_normal((2, 4, in_len)).astype(np.float32)
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=out_len).numpy()
    got = np.asarray(nearest_resize_1d(jnp.asarray(x), out_len, axis=2))
    np.testing.assert_array_equal(got, want)


def test_noise_assignment_deterministic(rng):
    from sos_tpu.data.index import FileRecord

    tracks = [rng.standard_normal(30000).astype(np.float32) for _ in range(3)]
    bank = NoiseBank.from_arrays(tracks, 14000)
    files = [FileRecord(path=f"f{i}.wav", audio_path=f"f{i}.wav",
                        duration=1.5, audio_samples=21000) for i in range(3)]
    a = bank.assign_for_prediction(files, snrs=[-10, 0, 10], seed=100)
    b = bank.assign_for_prediction(files, snrs=[-10, 0, 10], seed=100)
    for k in a:
        np.testing.assert_array_equal(a[k][0], b[k][0])
        assert a[k][1] == b[k][1]
    c = bank.assign_for_prediction(files, snrs=[-10, 0, 10], snr_idx=2, seed=100)
    assert all(v[1] == 10 for v in c.values())


def test_average_meter():
    m = AverageMeter("x")
    m.update(1.0)
    m.update(3.0)
    assert m.avg == pytest.approx(2.0)
    m.update(5.0, n=2)
    assert m.avg == pytest.approx((1 + 3 + 10) / 4)


def test_cycle_reshuffles_and_raises_on_empty():
    calls = []

    def factory():
        calls.append(0)
        return iter([len(calls)])

    it = cycle(factory)
    assert next(it) == 1
    assert next(it) == 2  # factory re-invoked per pass

    with pytest.raises(ValueError):
        next(cycle(lambda: iter([])))


def test_masked_bilstm_exact_bucketing(rng):
    """Padded sequence + valid_len == unpadded sequence on valid steps."""
    c, h, b = 6, 4, 2
    model = BiLSTM(hidden=h)
    x_valid = rng.standard_normal((b, 9, c)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x_valid))
    want = np.asarray(model.apply(variables, jnp.asarray(x_valid)))

    x_pad = np.concatenate(
        [x_valid, rng.standard_normal((b, 7, c)).astype(np.float32)], axis=1)
    got = np.asarray(model.apply(variables, jnp.asarray(x_pad),
                                 valid_len=jnp.int32(9)))
    np.testing.assert_allclose(got[:, :9], want, atol=1e-6)
    np.testing.assert_array_equal(got[:, 9:], 0)
