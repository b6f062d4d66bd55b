"""ThreadPrefetcher: ordering, bounded depth, and error propagation
(a swallowed loader exception would silently truncate the epoch —
the reference's DataLoader workers re-raise too)."""

import time

import pytest

from ucnerf_tpu.utils.prefetch import ThreadPrefetcher


def test_prefetcher_preserves_order():
    assert list(ThreadPrefetcher((lambda i=i: i * i for i in range(8)))) \
        == [i * i for i in range(8)]


def test_prefetcher_reraises_loader_errors():
    def boom():
        raise ValueError("bad sample")

    it = ThreadPrefetcher(iter([lambda: 1, boom, lambda: 3]))
    got = []
    with pytest.raises(ValueError, match="bad sample"):
        for x in it:
            got.append(x)
    assert got == [1]


def test_prefetcher_bounded_depth():
    """At most `depth` thunks run ahead of the consumer."""
    produced = []

    def make(i):
        def thunk():
            produced.append(i)
            return i
        return thunk

    it = iter(ThreadPrefetcher((make(i) for i in range(10)), depth=2))
    next(it)
    time.sleep(0.2)  # let the producer fill the queue
    # consumed 1; queue holds <=2 more; one more may be blocked in put()
    assert len(produced) <= 1 + 2 + 1
    assert list(it) == list(range(1, 10))
