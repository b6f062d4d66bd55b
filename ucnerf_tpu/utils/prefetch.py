"""Host-side background prefetching (the reference uses 8 DataLoader workers,
train.py:94-101; here one thread overlapping host decode + H2D with device
compute is enough because the dataset arrays are precomputed per scene)."""

from __future__ import annotations

import queue
import threading


class ThreadPrefetcher:
    """Iterate over thunks, computing up to `depth` results ahead on a
    background thread."""

    _DONE = object()

    def __init__(self, thunks, depth: int = 2):
        self._q = queue.Queue(maxsize=depth)
        self._err = None
        self._thread = threading.Thread(target=self._run, args=(thunks,),
                                        daemon=True)
        self._thread.start()

    def _run(self, thunks):
        try:
            for thunk in thunks:
                self._q.put(thunk())
        except BaseException as e:  # re-raised on the consumer thread —
            self._err = e           # a swallowed loader error would silently
        finally:                    # truncate the epoch
            self._q.put(self._DONE)

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is self._DONE:
                if self._err is not None:
                    raise self._err
                return
            yield item
