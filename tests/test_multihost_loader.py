"""Multi-host input sharding (SURVEY §5.8; the slot the reference fills
with per-rank DDP loaders at reference train.py:93-112).

Simulates P processes by instantiating P DataLoaders with explicit
(process_index, process_count): every process runs the same deterministic
(seed, epoch) global shuffle, so their contiguous per-batch slices must
reassemble the single-process loader's batches exactly — across epochs,
with samplers, and under mid-epoch resume.
"""

import numpy as np
import pytest

from muvo_tpu.data.loader import DataLoader


class _Ds:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"i": np.int64(i), "x": np.full((3,), float(i))}


def _collect(loader):
    return list(iter(loader))


@pytest.mark.parametrize("num_workers", [0, 2])
@pytest.mark.parametrize("pc", [2, 4])
def test_process_slices_reassemble_global_batches(pc, num_workers):
    ds = _Ds(37)
    kw = dict(batch_size=8, shuffle=True, seed=5, num_workers=num_workers)
    global_loader = DataLoader(ds, process_index=0, process_count=1, **kw)
    locals_ = [DataLoader(ds, process_index=p, process_count=pc, **kw)
               for p in range(pc)]

    for epoch in (0, 1):
        global_loader.set_epoch(epoch)
        for l in locals_:
            l.set_epoch(epoch)
        want = _collect(global_loader)
        got_parts = [_collect(l) for l in locals_]
        assert all(len(g) == len(want) for g in got_parts)
        for b, wb in enumerate(want):
            for k in wb:
                got = np.concatenate([got_parts[p][b][k] for p in range(pc)])
                np.testing.assert_array_equal(got, wb[k], err_msg=f"{k}@{b}")
            # per-host shard sizes are equal (global array assembly needs it)
            sizes = {got_parts[p][b]["i"].shape[0] for p in range(pc)}
            assert sizes == {8 // pc}


def test_local_batches_disjoint_and_resume():
    ds = _Ds(32)
    loaders = [DataLoader(ds, 8, shuffle=True, seed=1, process_index=p,
                          process_count=2) for p in range(2)]
    a, b = (_collect(l) for l in loaders)
    for ba, bb in zip(a, b):
        assert not set(ba["i"].tolist()) & set(bb["i"].tolist())
    # iter_from skips the same global batches on every process
    a2 = list(loaders[0].iter_from(2))
    np.testing.assert_array_equal(a2[0]["i"], a[2]["i"])


def test_sampler_respected_per_process():
    ds = _Ds(40)
    sampler = list(range(0, 40, 2))  # 20 even indices
    g = _collect(DataLoader(ds, 4, shuffle=False, sampler=sampler,
                            process_index=0, process_count=1))
    parts = [_collect(DataLoader(ds, 4, shuffle=False, sampler=sampler,
                                 process_index=p, process_count=2))
             for p in range(2)]
    assert len(g) == 5
    for b, wb in enumerate(g):
        got = np.concatenate([parts[0][b]["i"], parts[1][b]["i"]])
        np.testing.assert_array_equal(got, wb["i"])


def test_indivisible_global_batch_rejected():
    with pytest.raises(ValueError):
        DataLoader(_Ds(8), 6, process_index=0, process_count=4)


class _CountingDs(_Ds):
    """Counts decoded items so the test can observe decode-ahead."""

    def __init__(self, n):
        super().__init__(n)
        import threading

        self.decoded = 0
        self._lock = threading.Lock()

    def __getitem__(self, i):
        with self._lock:
            self.decoded += 1
        return super().__getitem__(i)


def test_threaded_prefetch_is_bounded_and_ordered():
    """Regression: without backpressure the decode threads raced the
    consumer and parked every decoded batch in memory (the r4 health train
    run's host RSS hit 122 GB before the kernel OOM-killed it). In-flight
    decoded batches must stay <= 2*n_workers + 2 regardless of how slow
    the consumer is, and order must be preserved."""
    import time

    ds = _CountingDs(64)
    bs, workers = 4, 2
    loader = DataLoader(ds, batch_size=bs, shuffle=False,
                        num_workers=workers)
    max_ahead = 2 * workers + 2
    seen = []
    for k, batch in enumerate(iter(loader)):
        time.sleep(0.02)  # slow consumer: decoders would race ahead
        # decoded items may exceed consumed items only by the in-flight
        # window (+1 batch: the semaphore is released before the yield)
        assert ds.decoded <= (k + 1 + max_ahead + 1) * bs, (
            f"decode-ahead unbounded: {ds.decoded} items decoded "
            f"after {k + 1} batches consumed")
        seen.extend(batch["i"].tolist())
    assert seen == list(range(64))


def test_threaded_iterator_abandonment_stops_decoding():
    """An iterator dropped after a few batches (evaluator's max_batches
    cap) must stop its decode threads instead of decoding the rest of the
    epoch into the parked-results dict."""
    import gc
    import time

    ds = _CountingDs(256)
    loader = DataLoader(ds, batch_size=4, shuffle=False, num_workers=2)
    it = iter(loader)
    for _ in range(3):
        next(it)
    it.close()  # what GC of an abandoned generator does
    gc.collect()
    time.sleep(1.5)  # workers poll the stop flag at 1s granularity
    decoded_after_close = ds.decoded
    time.sleep(1.5)
    assert ds.decoded == decoded_after_close, "decoding continued after close"
    assert ds.decoded <= (3 + 2 * 2 + 2 + 1) * 4
