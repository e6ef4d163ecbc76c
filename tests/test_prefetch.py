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


def test_batcher_shard_decorrelates_noise_streams(tmp_path):
    """Hosts draw DIFFERENT noise/SNR streams: without per-host seed
    decorrelation, item j of every host's batch would get the identical
    noise crop (iter_from seeds by (seed, epoch) only), cutting the pod's
    noise-augmentation diversity N-fold."""
    from sos_tpu.data.pipeline import DenoiserBatcher
    from sos_tpu.data.windows import DenoiserWindow
    from sos_tpu.dsp import audio_io

    sr = 14000
    rng = np.random.default_rng(0)
    wav = str(tmp_path / "c.wav")
    audio_io.write_wav(wav, rng.standard_normal(sr * 8).astype(np.float32) * 0.2,
                       sr)
    windows = [DenoiserWindow(file_index=0, audio_path=wav,
                              start_sec=float(i), end_sec=float(i + 2),
                              bits="1" * 60, framerate=30)
               for i in range(4)]
    bank = NoiseBank.from_arrays(
        [rng.standard_normal(sr * 6).astype(np.float32) * 0.1
         for _ in range(4)], sr)

    def host_batch(h):
        b = DenoiserBatcher(windows, bank, DataConfig(), batch_size=2,
                            shuffle=False, seed=0).shard(h, 2)
        b.set_epoch(0)
        return next(iter(b))

    b0, b1 = host_batch(0), host_batch(1)
    # disjoint window shards (different clean audio) AND different rng
    # streams (different noise crops) — the latter is what this pins
    assert not np.array_equal(b0["noise"], b1["noise"])
    # determinism per (host, epoch) is preserved
    b0_again = host_batch(0)
    np.testing.assert_array_equal(b0["noise"], b0_again["noise"])
    np.testing.assert_array_equal(b0["snr"], b0_again["snr"])


def test_prefetch_stopiteration_after_exhaustion_and_close():
    """Iterator protocol: next() after exhaustion (or close()) raises
    StopIteration instead of blocking forever on the drained queue, and
    a producer error re-raises exactly once."""
    from sos_tpu.data.prefetch import prefetch

    it = prefetch(iter([1, 2, 3]), depth=2)
    assert list(it) == [1, 2, 3]
    with pytest.raises(StopIteration):
        next(it)
    with pytest.raises(StopIteration):  # and stays exhausted
        next(it)

    it2 = prefetch(iter([1, 2, 3, 4, 5, 6]), depth=1)
    assert next(it2) == 1
    it2.close()
    with pytest.raises(StopIteration):
        next(it2)

    def boom():
        yield 1
        raise RuntimeError("producer died")

    it3 = prefetch(boom(), depth=2)
    assert next(it3) == 1
    with pytest.raises(RuntimeError, match="producer died"):
        next(it3)
    with pytest.raises(StopIteration):  # raised once, then exhausted
        next(it3)


def test_prefetch_close_joins_producer():
    """close() returns only after the producer thread has exited (it
    mutates the batcher's shared wav cache, so a still-running producer
    would race any post-close() user of the batcher)."""
    import threading
    import time

    from sos_tpu.data.prefetch import prefetch

    in_item = threading.Event()

    def slow():
        for i in range(100):
            if i == 1:
                in_item.set()
                time.sleep(0.3)  # close() lands mid-assembly
            yield i

    it = prefetch(slow(), depth=1)
    assert next(it) == 0
    assert in_item.wait(timeout=10)
    it.close()
    assert not it._thread.is_alive()


def test_prefetch_cross_thread_close_releases_blocked_consumer():
    """A consumer blocked in __next__ while ANOTHER thread calls close()
    must be released (StopIteration), not stranded: close() drains the
    queue and the producer exits without a sentinel, so close() itself
    re-injects one after the join."""
    import threading
    import time

    stall = threading.Event()

    def src():
        yield 1
        stall.wait(10)  # released only AFTER close() has set _stop

    p = Prefetcher(src(), depth=1)
    released = threading.Event()

    def consume():
        assert next(p) == 1
        try:
            next(p)  # blocks: queue empty, producer stalled
        except StopIteration:
            pass
        released.set()

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    time.sleep(0.3)  # consumer is now blocked in q.get()
    closer = threading.Thread(target=p.close, daemon=True)
    closer.start()  # sets _stop first, then waits for the producer
    time.sleep(0.2)
    stall.set()  # producer resumes, sees _stop, exits WITHOUT a sentinel
    closer.join(timeout=10)
    assert not closer.is_alive()
    assert released.wait(timeout=5), (
        "consumer stayed blocked in __next__ after cross-thread close()")
