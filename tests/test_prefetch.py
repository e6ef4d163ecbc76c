"""Async input pipeline: prefetcher equivalence, threaded NoiseBank,
per-host sharding."""

import time

import numpy as np
import pytest

from sos_tpu.config import DataConfig
from sos_tpu.data.prefetch import Prefetcher, prefetch
from sos_tpu.data.sampling import NoiseBank


def test_prefetch_yields_identical_sequence():
    items = [{"a": np.full((4,), i)} for i in range(20)]
    got = list(prefetch(iter(items), depth=3))
    assert len(got) == 20
    for i, g in enumerate(got):
        np.testing.assert_array_equal(g["a"], items[i]["a"])


def test_prefetch_overlaps_production():
    def slow_src():
        for i in range(6):
            time.sleep(0.05)
            yield i

    t0 = time.perf_counter()
    out = []
    for x in prefetch(slow_src(), depth=2):
        time.sleep(0.05)  # consumer work overlaps producer work
        out.append(x)
    elapsed = time.perf_counter() - t0
    assert out == list(range(6))
    assert elapsed < 0.55  # serial would be ~0.6s+


def test_prefetch_propagates_exceptions():
    def bad():
        yield 1
        raise RuntimeError("boom")

    it = prefetch(bad(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        next(it)


def test_prefetch_close_mid_iteration():
    def infinite():
        i = 0
        while True:
            yield i
            i += 1

    it = Prefetcher(infinite(), depth=2)
    assert next(it) == 0
    it.close()  # must not hang


def test_noise_bank_threaded_matches_serial(tmp_path):
    from sos_tpu.dsp import audio_io

    rng = np.random.default_rng(0)
    sr = 14000
    paths = []
    for i in range(5):
        p = str(tmp_path / f"n{i}.wav")
        audio_io.write_wav(p, rng.standard_normal(sr).astype(np.float32) * 0.2, sr)
        paths.append(p)
    serial = NoiseBank(paths, sr, num_threads=1)
    threaded = NoiseBank(paths, sr, num_threads=4)
    assert serial.paths == threaded.paths
    for a, b in zip(serial.tracks, threaded.tracks):
        np.testing.assert_array_equal(a, b)


def test_batcher_shard_partitions_windows(tmp_path):
    from sos_tpu.data.pipeline import DenoiserBatcher
    from sos_tpu.data.windows import DenoiserWindow

    windows = [DenoiserWindow(file_index=0, audio_path="x.wav",
                              start_sec=float(i), end_sec=float(i + 2),
                              bits="1" * 60, framerate=30)
               for i in range(10)]
    bank = NoiseBank.from_arrays([np.zeros(28000, np.float32)], 14000)
    shards = []
    for h in range(3):
        b = DenoiserBatcher(windows, bank, DataConfig(), batch_size=1,
                            shuffle=False).shard(h, 3)
        shards.append([w.start_sec for w in b.windows])
    # balanced: every host holds exactly floor(10/3)=3 windows (the tail
    # is dropped so per-host step counts match — unequal counts would
    # desynchronize the multi-host SPMD loop), shards are disjoint
    assert [len(s) for s in shards] == [3, 3, 3]
    flat = sorted(s for sh in shards for s in sh)
    assert len(set(flat)) == 9
    assert all(len(set(a) & set(b)) == 0
               for i, a in enumerate(shards) for b in shards[i + 1:])
    with pytest.raises(ValueError):
        DenoiserBatcher(windows, bank, DataConfig(), batch_size=1,
                        shuffle=False).shard(3, 3)
