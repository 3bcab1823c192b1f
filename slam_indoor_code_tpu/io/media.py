"""Media ingest: a uniform frame source over photo globs or video files.

Reference behaviour reproduced (src/mainModule/cycleProcessing/
mainCycleInternals.cpp:44-61 ``defineMediaSources``, :107-119
``getNextFrame``): photos are globbed, naturally sorted (shorter names first,
then lexicographic — matching ``sortGlobs``, src/misc/IOmisc.cpp:36-51), and
destructively popped; video frames are decoded sequentially.  A background
prefetch thread with a bounded queue keeps decode off the accelerator-feeding
path (the reference decoded synchronously inside ``fillVideoFrameBatch`` —
batch fill cost ≈123–440 ms in its logs; prefetch hides this, see SURVEY.md §6).
"""

from __future__ import annotations

import glob as _glob
import queue
import threading
from typing import Iterator, Optional

import numpy as np


def natural_sort_paths(paths: list[str]) -> list[str]:
    """Sort photo paths by length first, then lexicographically.

    This matches the observable behaviour of the reference's ``sortGlobs``
    (src/misc/IOmisc.cpp:36-51): its comparator orders shorter names before
    longer ones and otherwise compares strings — which sorts ``img2.jpg``
    before ``img10.jpg``."""
    return sorted(paths, key=lambda p: (len(p), p))


def _imread_rgb(path: str) -> Optional[np.ndarray]:
    """Decode one image to HxWx3 uint8 RGB (host-side; not a TPU op).

    Prefers the native libjpeg/libpng decoder (native/slamio.cpp)."""
    from . import native

    if native.available():
        img = native.imread_rgb(path)
        if img is not None:
            return img
    try:
        import cv2

        img = cv2.imread(path)
        if img is None:
            return None
        return img[:, :, ::-1].copy()  # BGR → RGB
    except ImportError:
        import imageio.v3 as iio

        img = iio.imread(path)
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        return np.ascontiguousarray(img[:, :, :3])


class MediaSource:
    """Destructive frame iterator over a photo glob or a video file."""

    def __init__(
        self,
        *,
        photos_pattern: str = "",
        video_path: str = "",
        use_photos: bool = True,
        prefetch: int = 8,
        threads: int = 2,
    ):
        self.use_photos = use_photos
        self._video = None
        self._native = None
        self._paths: list[str] = []
        if use_photos:
            self._paths = natural_sort_paths(_glob.glob(photos_pattern))
            from . import native

            if native.available() and self._paths:
                # native prefetching decoder (no python thread needed)
                # threadsCount maps onto decode workers (the reference used
                # it for its matching thread pool, which we vectorized away)
                self._native = native.NativeSequence(
                    self._paths, capacity=max(1, prefetch),
                    threads=max(1, threads))
                return
        else:
            import cv2

            self._video = cv2.VideoCapture(video_path)
            if not self._video.isOpened():
                raise IOError(f"Video wasn't opened: {video_path}")
        self._queue: queue.Queue = queue.Queue(maxsize=max(1, prefetch))
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._done = object()
        self._thread.start()

    def _producer(self) -> None:
        if self.use_photos:
            for p in self._paths:
                img = _imread_rgb(p)
                if img is None:
                    break
                self._queue.put(img)
        else:
            while True:
                ok, frame = self._video.read()
                if not ok:
                    break
                self._queue.put(frame[:, :, ::-1].copy())
        self._queue.put(self._done)

    def next_frame(self) -> Optional[np.ndarray]:
        """Pop the next frame, or None when the sequence is over (reference:
        ``getNextFrame`` returning false, mainCycleInternals.cpp:107-119)."""
        if self._native is not None:
            return self._native.next_frame()
        item = self._queue.get()
        if item is self._done:
            self._queue.put(self._done)  # keep signalling exhaustion
            return None
        return item

    def __iter__(self) -> Iterator[np.ndarray]:
        while True:
            f = self.next_frame()
            if f is None:
                return
            yield f


class ArraySource:
    """A MediaSource-compatible frame source over an in-memory array/list of
    frames — used by tests, benchmarks, and synthetic scenes."""

    def __init__(self, frames):
        self._frames = list(frames)
        self._i = 0

    def next_frame(self) -> Optional[np.ndarray]:
        if self._i >= len(self._frames):
            return None
        f = self._frames[self._i]
        self._i += 1
        return np.asarray(f)

    def __iter__(self) -> Iterator[np.ndarray]:
        while True:
            f = self.next_frame()
            if f is None:
                return
            yield f
