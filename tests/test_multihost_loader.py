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
