"""Frame-batch scheduler: fill + good-frame selection with the reference's
exact semantics, minus its thread pool.

Reference behaviour reproduced (src/mainModule/cycleProcessing/batch.cpp):
- ``fill``: decode frames, keep only those with ≥ requiredExtractedPointsCount
  FAST corners, until the batch holds framesBatchSize candidates or the media
  ends (fillVideoFrameBatch, batch.cpp:228-267).  The unused tail of the
  previous batch carries over.
- ``find_good_frame``: match the previous frame against every candidate and
  scan tail→head over indices ≥ skipFramesFromBatchHead, keeping the frame
  with the *maximum* match count ≥ requiredMatchedPointsCount (ties go to the
  head-most), or the tail-most fitting frame when useFirstFitInBatch
  (findGoodFramesFromBatchSingleThread, batch.cpp:101-160).  On success the
  batch head through the chosen index is consumed (batch.cpp:93-98).

TPU-native difference: the reference matches candidates one at a time across
std::threads with a busy-wait consumer (and a data race — SURVEY.md §5.2);
here the *entire* batch matches in one [B,N,M] device program
(models.frontend.match_against_batch), and descriptors are computed once at
fill time instead of re-extracted every scan (batch.cpp:113 recomputes).
The scheduling itself reduces to a tiny host argmax.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..models import frontend as fe
from .structures import BatchElement

EMPTY_BATCH = -1
FRAME_NOT_FOUND = -2

_FILL_CHUNK = 8  # frames decoded + gated per device call during fill


@dataclass
class GoodFrame:
    index: int
    element: BatchElement
    match_train: np.ndarray  # [K] int32
    match_mask: np.ndarray   # [K] bool
    num_matches: int


class BatchScheduler:
    def __init__(self, media, fcfg: fe.FrontendConfig, *,
                 batch_size: int,
                 required_extracted: int,
                 required_matched: int,
                 skip_from_head: int = 0,
                 use_first_fit: bool = False,
                 head_tie_tolerance: float = 0.0,
                 report=None,
                 K=None, dist=None):
        self.media = media
        self.fcfg = fcfg
        # useUndistortion: corrected at fill time so matching/geometry see
        # undistorted pixels (mirrors runtime/steps.py ingest placement)
        self.K = K
        self.dist = dist
        self.batch_size = batch_size
        self.required_extracted = required_extracted
        self.required_matched = required_matched
        self.skip_from_head = skip_from_head
        self.use_first_fit = use_first_fit
        self.head_tie_tolerance = head_tie_tolerance
        self.batch: list[BatchElement] = []
        self._pending: list[BatchElement] = []
        self._media_over = False
        self.report = report  # optional main.txt-style stream
        self.skipped_frames_total = 0

    # ------------------------------------------------------------------ fill
    def fill(self) -> int:
        """Top the batch up to ``batch_size``; returns number skipped
        (too-few-corners frames), mirroring fillVideoFrameBatch."""
        skipped = 0
        accepted_counts = []
        # admit previously decoded extras first (keeps batch at capacity
        # without re-decoding; chunked device calls may produce overshoot)
        while self._pending and len(self.batch) < self.batch_size:
            el = self._pending.pop(0)
            accepted_counts.append(int(np.asarray(el.valid).sum()))
            self.batch.append(el)
        while len(self.batch) < self.batch_size and not self._media_over:
            chunk = []
            while len(chunk) < _FILL_CHUNK:
                f = self.media.next_frame()
                if f is None:
                    self._media_over = True
                    break
                chunk.append(f)
            if not chunk:
                break
            pad = _FILL_CHUNK - len(chunk)
            stacked = np.stack(chunk + [chunk[-1]] * pad)  # pad: one compile
            rgb = jnp.asarray(stacked)
            res = fe.extract_and_describe_batch(self.fcfg, rgb)
            if self.dist is not None:
                from ..geometry.projection import undistort_points

                res = dict(res)
                res["xy"] = undistort_points(self.K, self.dist, res["xy"])
            counts = np.asarray(res["num_corners"])
            for i in range(len(chunk)):
                if counts[i] < self.required_extracted:
                    skipped += 1
                    continue
                el = BatchElement(
                    frame=chunk[i],
                    xy=res["xy"][i],
                    valid=res["valid"][i],
                    score=res["score"][i],
                    desc=res["desc"][i],
                    colors=np.asarray(res["colors"][i]),
                )
                if len(self.batch) < self.batch_size:
                    accepted_counts.append(int(counts[i]))
                    self.batch.append(el)
                else:
                    self._pending.append(el)
        if self.report is not None:
            self.report.write(
                "Features count in frames added to batch: "
                + " ".join(str(c) for c in accepted_counts) + "\n"
                f"Skipped frames while constructing batch: {skipped}\n"
                f"Batch size: {len(self.batch)}\n"
            )
        self.skipped_frames_total += skipped
        return skipped

    # ------------------------------------------------------- good-frame scan
    def find_good_frame(self, prev_desc, prev_valid) -> GoodFrame | int:
        """Fill, match previous frame against the whole batch on device, and
        apply the tail→head max-count selection rule."""
        self.fill()
        if not self.batch:
            return EMPTY_BATCH

        B = len(self.batch)
        desc_batch = jnp.stack([el.desc for el in self.batch])
        valid_batch = jnp.stack([el.valid for el in self.batch])
        frame_mask = jnp.ones((B,), bool)
        res = fe.match_against_batch(
            self.fcfg, prev_desc, prev_valid, desc_batch, valid_batch, frame_mask
        )
        counts = np.asarray(res["num_matches"])
        if self.report is not None:
            for bi in range(B - 1, self.skip_from_head - 1, -1):
                self.report.write(
                    f"Batch index: {bi}; curr. extracted: "
                    f"{int(np.asarray(self.batch[bi].valid).sum())}; "
                    f"matched {int(counts[bi])}\n"
                )

        good = self._select(counts)
        if good == FRAME_NOT_FOUND:
            return FRAME_NOT_FOUND

        gf = GoodFrame(
            index=good,
            element=self.batch[good],
            match_train=np.asarray(res["train_idx"][good]),
            match_mask=np.asarray(res["is_match"][good]),
            num_matches=int(counts[good]),
        )
        # consume head..good; tail carries over (batch.cpp:93-98)
        self.batch = self.batch[good + 1 :]
        return gf

    def _select(self, counts: np.ndarray) -> int:
        B = len(counts)
        lo = min(self.skip_from_head, B)
        eligible = np.flatnonzero(counts[lo:] >= self.required_matched) + lo
        if len(eligible) == 0:
            return FRAME_NOT_FOUND
        if self.use_first_fit:
            return int(eligible.max())  # tail-most fit (scan breaks at tail)
        best = counts[eligible].max()
        # head_tie_tolerance > 0: documented divergence knob — any eligible
        # count within the tolerance of the best competes, head-most wins
        # (steps._select_good is the device twin of this rule)
        cut = (int(np.ceil(best * (1.0 - self.head_tie_tolerance)))
               if self.head_tie_tolerance > 0.0 else best)
        return int(eligible[counts[eligible] >= cut].min())  # head-most max

    # ------------------------------------------------------------- bootstrap
    def pop_head(self) -> BatchElement:
        """Promote the batch head to a new first frame (first-pair fallback,
        mainCycle.cpp:299-315)."""
        el = self.batch[0]
        self.batch = self.batch[1:]
        return el

    @property
    def media_exhausted(self) -> bool:
        return self._media_over and not self.batch and not self._pending
