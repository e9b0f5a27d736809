"""Host-heap hygiene hooks (utils/hostmem.py).

Regression guard for VERDICT r4 weak-item #4: the ~65 MB/step host RSS
growth in long real-data runs (glibc arena free-list bloat from threaded
decode).  These assert the libc hooks resolve and actually release heap
pages on this platform — if glibc ever stops exporting malloc_trim or
mallopt the training loop silently loses its RSS bound, so fail loudly
here instead.
"""

import numpy as np

from muvo_tpu.utils.hostmem import cap_malloc_arenas, trim_host_heap


def _rss_kb() -> int:
    with open("/proc/self/status") as f:
        return int(next(l for l in f if l.startswith("VmRSS")).split()[1])


def test_hooks_resolve_and_run():
    # glibc is the baked-in libc on this image; both must resolve
    assert cap_malloc_arenas(2)
    assert trim_host_heap()


def test_trim_releases_freed_heap():
    # allocate+free ~256 MB of malloc'd buffers, then trim: RSS must drop
    # back to within 64 MB of the starting point (without trim, glibc keeps
    # the pages on arena free lists indefinitely)
    base = _rss_kb()
    bufs = [np.empty(8 << 20, np.uint8) for _ in range(32)]
    for b in bufs:
        b[::4096] = 1  # touch pages so they are resident
    del bufs
    trim_host_heap()
    grown_kb = _rss_kb() - base
    assert grown_kb < 64 * 1024, f"RSS grew {grown_kb} kB after free+trim"
