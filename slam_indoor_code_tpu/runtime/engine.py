"""Host conductor for the device-resident runtime.

Python owns only control flow and slot bookkeeping; every array lives on the
device.  Two steady-state loops:

* **Streaming** (default for host-ingest configs, ``run_streaming``): the
  candidate queue's cursors live ON DEVICE (steps.queue_append /
  steps.advance_stream) and the windowed BA solves in-scan, so window
  dispatches issue back-to-back with no host sync between them; the host
  trails 1-2 dispatches behind, processing each dispatch's ~1.5 KB status
  download from a background thread (logging, trajectory, stop decisions).
  Relay round-trips leave the critical path entirely.

* **Classic** (device ingest, meshed runs, per-frame telemetry): ONE fused
  ``advance_window`` dispatch tracks a whole BA window (up to 8 frames) and
  returns one ~1 KB status download the host syncs on; ``ba_step`` then
  solves and resets the window with its stats downloaded asynchronously.

Ring-slot management mirrors the reference's batch semantics (fill to
framesBatchSize, consume head..good, carry the tail — batch.cpp:228-267,
:93-98).

time.txt telemetry: in per-frame telemetry mode (tpu.per_frame_telemetry)
every "Matching time for index N" line is the measured wall time of that
single-step dispatch; in the fused modes one window's wall time is
apportioned equally over its scanned steps (format parity with
batch.cpp:155-157 — the fused dispatch is the very thing that makes
per-index host timing impossible without paying the sync back).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..io.logs import GlobalData, LogStreams
from ..utils.timer import ChronoTimer
from .state import EngineConfig, TrackerState, init_state
from . import steps

EMPTY_BATCH = -1
FRAME_NOT_FOUND = -2

_LINK_BW_MBPS: float | None = None


def measured_link_bandwidth_mbps() -> float:
    """Measure host→device transfer bandwidth once per process (4 MB random
    probe; random so a compressing transport can't flatter the number)."""
    global _LINK_BW_MBPS
    if _LINK_BW_MBPS is None:
        import time

        rng = np.random.default_rng(0)
        # Distinct buffers each put (jax caches re-puts of the same ndarray)
        # and a reduction + download to force the bytes across the wire
        # (put-completion alone can be satisfied before the transfer lands
        # on a tunneled transport).
        sum_fn = jax.jit(lambda a: a.astype(jnp.uint32).sum())
        warm = rng.integers(0, 255, (1 << 20,), np.uint8)
        probe = rng.integers(0, 255, (4 << 20,), np.uint8)
        np.asarray(sum_fn(jnp.asarray(np.resize(warm, probe.shape))))
        t0 = time.perf_counter()
        np.asarray(sum_fn(jnp.asarray(probe)))
        dt = max(time.perf_counter() - t0, 1e-6)
        _LINK_BW_MBPS = 4.0 / dt
    return _LINK_BW_MBPS


def resolve_ingest(mode: str) -> str:
    """Resolve the "auto" ingest policy: detect on the host (upload pooled
    gray + keypoints, ~0.55 MB/frame at FHD) when the link is slow; keep the
    all-device frontend (full gray upload) when the link is PCIe-class and
    host CPU is the scarcer resource."""
    if mode != "auto":
        return mode
    return "host" if measured_link_bandwidth_mbps() < 400.0 else "device"


class DeviceEngine:
    def __init__(self, media, K: np.ndarray, cfg: EngineConfig,
                 batch_size: int, required_extracted: int,
                 logs: LogStreams | None = None, seed: int = 0,
                 dist: np.ndarray | None = None,
                 checkpoint_path: str | None = None,
                 checkpoint_every: int = 0,
                 collect_global_obs: bool = False):
        import dataclasses

        self.media = media
        cfg = dataclasses.replace(cfg, ingest_mode=resolve_ingest(cfg.ingest_mode))
        # host-descriptor resolution: on the host-ingest (slow-link) path the
        # pooled gray costs ~2/3 of the ratio-test matches, so "auto" ships
        # full-resolution ORB bits from the host — pure Hamming for ORB
        # configs (exact reference parity: its CUDA build also computes
        # descriptors on the CPU), SIFT⊕bits hybrid otherwise
        if cfg.host_desc == "auto":
            if cfg.ingest_mode == "host":
                hd = "orb" if cfg.descriptor == "orb" else "hybrid"
            else:
                hd = "same"
            cfg = dataclasses.replace(cfg, host_desc=hd)
        if cfg.ingest_mode != "host" and cfg.host_desc != "same":
            cfg = dataclasses.replace(cfg, host_desc="same")
        if cfg.descriptor == "orb" and cfg.host_desc == "hybrid":
            # hybrid writes [K,384] float32 descriptors but desc_dim resolves
            # to 8 uint32 words when descriptor=="orb" — the ring scatter
            # would fail with an obscure shape/dtype error.  ORB configs get
            # pure host-ORB bits (same data the hybrid would carry).
            cfg = dataclasses.replace(cfg, host_desc="orb")
        if cfg.host_desc == "orb":
            cfg = dataclasses.replace(cfg, metric="hamming")
        if cfg.ingest_mode == "host" and cfg.ingest_downscale > 1 \
                and 2.0 * float(K[0, 2]) < 1024.0:
            # gray pooling exists to cut FHD upload bytes; below ~1024 px
            # width the descriptor-fidelity loss dominates (measured: ATE
            # 0.002 → 0.067 of extent at 320 px with d=2) while the upload
            # is already small — disable it (cx ≈ width/2 proxy)
            cfg = dataclasses.replace(cfg, ingest_downscale=1)
        if cfg.rebind_cap > 0:
            # rebind_radius is specified in FHD-equivalent pixels (1920-wide
            # image); the useful reprojection gate scales with resolution, so
            # resolve to actual pixels here using the principal point as the
            # image-width proxy (cx ≈ width/2 — exact for the calibrations
            # this pipeline meets).  Floor at 1.5 px: below that the gate is
            # tighter than subpixel localisation noise and nothing re-binds.
            px = cfg.rebind_radius * (2.0 * float(K[0, 2])) / 1920.0
            cfg = dataclasses.replace(cfg, rebind_radius=max(px, 1.5))
        # reproj_gate_px (PnP inlier threshold + landmark verify gates) is
        # likewise FHD-equivalent: a fixed pixel gate is angularly 2x
        # TIGHTER at 4K, starving the verified set and putting the tracker
        # on a stability cliff (measured: 4K ATE flips 3.6% <-> 22% with the
        # RANSAC key draw).  Constant angular tolerance = scale with width.
        scale_w = (2.0 * float(K[0, 2])) / 1920.0
        if scale_w > 1.0:
            cfg = dataclasses.replace(
                cfg, reproj_gate_px=cfg.reproj_gate_px * scale_w)
        # window<=2 falls back to the classic loop: the bootstrap pair fills
        # the window completely (win_fill=2), and advance_stream steps gate on
        # win_pos < window with no flush-on-entry — every step would be
        # inactive and run_streaming would re-dispatch empty windows forever.
        # The classic loop flushes at its loop top, so it handles this config.
        self._will_stream = (cfg.streaming and cfg.ingest_mode == "host"
                             and cfg.window > 2
                             and not cfg.mesh_shape
                             and not cfg.per_frame_telemetry)
        if self._will_stream:
            # streaming-lag headroom: slots free only when their dispatch's
            # status download is collected (up to depth×T frames later), so
            # the ring needs room beyond the classic batch+prefetch bound
            cfg = dataclasses.replace(cfg, ring=cfg.ring + 24)
        self.cfg = cfg
        self.mesh = None
        if cfg.mesh_shape:
            # Multi-chip product path: one "batch"-axis mesh; the step
            # functions annotate their fan-out intermediates against it
            # (steps.set_active_mesh) and XLA inserts the collectives.
            import numpy as _np

            from ..parallel.mesh import make_mesh

            n = int(_np.prod(cfg.mesh_shape))
            self.mesh = make_mesh((n,), ("batch",))
            steps.set_active_mesh(self.mesh)
        self.batch_size = batch_size
        self.required_extracted = required_extracted
        self.logs = logs
        self.state = init_state(K, cfg, dist=dist)
        self._key = jax.random.PRNGKey(seed)
        self._free = list(range(cfg.ring))
        self.batch: list[int] = []      # ring slots in batch order (head first)
        self._staged: list = []         # futures of (slots, n, gray, small)
        self._pending: list = []        # dispatched ingests: (slots, n, counts)
        from concurrent.futures import ThreadPoolExecutor

        # packer threads: numpy/cv2 packing releases the GIL and device_put
        # is thread-safe, so payload prep+upload rides alongside tracking
        # compute; three workers let a chunk PACK (CPU) while two earlier
        # chunks' uploads sit in socket I/O on the tunnel
        # (chunk order is preserved — _staged futures pop FIFO)
        self._packer = ThreadPoolExecutor(max_workers=3)
        # adaptive extraction gate (host ingest only): the live host-side
        # FAST threshold.  Chunks capture it at STAGE time on the main
        # thread, so the chunk→threshold mapping is a deterministic function
        # of the collected-count history (no wall-clock dependence); the
        # checkpoint persists it (v5) so a resumed run continues with the
        # adapted value.
        self._fast_threshold = float(cfg.threshold)
        self._fast_floor = max(5.0, float(cfg.threshold) / 4.0)
        self._media_over = False
        self._win_fill = 0
        self.trajectory_R: list[np.ndarray] = []   # flushed (post-BA) poses
        self.trajectory_t: list[np.ndarray] = []
        self._pending_poses = 0  # accepted frames not yet flushed
        self.frames_accepted = 0
        self._frame_counter = 0           # source frame index from media
        self._slot_frame: dict[int, int] = {}  # ring slot → source frame id
        self._prev_fid = -1               # frame id of the prev/ref frame
        self._win_ids: list[int] = []     # frame ids of the current window
        self._ba_pending = None           # deferred ba_step output
        # periodic checkpointing (SURVEY.md §5.4): snapshot at window
        # boundaries every `checkpoint_every` accepted frames; kept out of
        # EngineConfig so the path/interval never key a recompilation
        self.checkpoint_path = checkpoint_path
        self.checkpoint_every = int(checkpoint_every)
        self._last_checkpoint_at = 0
        # final global BA (solver/global_ba.py): per-window observation
        # snapshots accumulate host-side; downloads ride the packer thread
        self.collect_global_obs = collect_global_obs
        self._global_obs: list = []  # (future(xy, corr), fill, frame ids)
        # flushed (post-BA) trajectory mirror, engine-lifetime: what the
        # checkpoint persists so a resumed run reproduces the FULL output
        # trajectory (and an identical final global-BA problem), not just
        # the post-resume tail
        self.flushed_R: list = []
        self.flushed_t: list = []
        self.flushed_ids: list = []
        # ---- streaming runtime cursors (run_streaming) -------------------
        # device-held queue cursors, threaded between dispatches; the host
        # never downloads them — q_len rides in each dispatch's status rows
        self._q_dev = None            # [ring] i32 slot queue (device)
        self._qhead_dev = None        # () i32
        self._qlen_dev = None         # () i32
        self._winfill_dev = None      # () i32
        self._dead_dev = None         # () bool
        self._inflight: list = []     # (download_future, n_steps) per dispatch
        self._adm_total = 0           # frames appended to the device queue
        self._cons_known = 0          # frames consumed per PROCESSED rows
        self._stream_depth = 2        # max un-collected advance dispatches

    # ------------------------------------------------------------- plumbing
    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def _log_pose(self, R: np.ndarray, t: np.ndarray):
        if self.logs:
            self.logs.write_pose(np.asarray(R, np.float64).reshape(3, 3),
                                 np.asarray(t, np.float64).reshape(3))

    @staticmethod
    def _host_np(x) -> np.ndarray:
        """np.asarray that also handles cross-process sharded jax.Arrays:
        on a mesh spanning OS processes the per-candidate match counts are
        sharded over non-addressable devices, and fetching them needs the
        collective allgather (every process calls this at the same point,
        so the collective is globally consistent)."""
        import jax

        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(x)

    @staticmethod
    def _unpack(out: np.ndarray):
        ok, n_corr, n_inl, n_new, n_matches = out[:5]
        R = out[5:14].reshape(3, 3)
        t = out[14:17]
        return bool(ok > 0.5), int(n_corr), int(n_inl), int(n_new), int(n_matches), R, t

    # ------------------------------------------------------------------ fill
    #
    # Staged-upload pipeline: the host↔device link is the end-to-end
    # bottleneck (measured ~15-55 MB/s through the remote tunnel), so frame
    # payloads are device_put EARLY (transfer rides the wire in the
    # background) while the ingest compute is dispatched LATE (so tracking
    # dispatches never queue behind a transfer that isn't needed yet).

    def _stage_chunk(self) -> bool:
        """Decode the next chunk and start its async upload; reserves ring
        slots immediately.  Returns False when no frame was staged."""
        C = self.cfg.fill_chunk
        if self._media_over or len(self._free) < C:
            return False
        chunk = []
        while len(chunk) < C:
            f = self.media.next_frame()
            if f is None:
                self._media_over = True
                break
            chunk.append(f)
        if not chunk:
            return False
        n = len(chunk)
        chunk = chunk + [chunk[-1]] * (C - n)  # padded lanes land in slots
        slots = np.array(self._free[:C], np.int32)
        self._free = self._free[C:]
        for i in range(n):
            self._slot_frame[int(slots[i])] = self._frame_counter + i
        self._frame_counter += n

        def _put(a):
            # device_put returns immediately; the transfer proceeds while the
            # device works through earlier dispatches.  On a mesh, payloads
            # land pre-sharded over the chunk axis so each device uploads
            # only its shard (parallel DMA on a real pod).
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                spec = P(*(("batch",) + (None,) * (a.ndim - 1)))
                return jax.device_put(a, NamedSharding(self.mesh, spec))
            return jnp.asarray(a)

        thr = self._fast_threshold  # captured on the main thread (see __init__)

        def pack_and_put():
            if self.cfg.ingest_mode == "host":
                from ..models.frontend import host_detect_pack

                p = host_detect_pack(chunk, thr,
                                     self.cfg.max_keypoints,
                                     self.cfg.ingest_downscale,
                                     host_desc=self.cfg.host_desc)
                if self.cfg.host_desc == "orb":
                    # packed bit words only — no image plane travels at all
                    words = p["desc_bits"].view(np.uint32).reshape(
                        p["desc_bits"].shape[0], -1, 8)
                    payload = (_put(words), _put(p["xy"]), _put(p["valid"]),
                               _put(p["colors"]), p["counts"])
                elif self.cfg.host_desc == "hybrid":
                    payload = (_put(p["gray_small"]), _put(p["desc_bits"]),
                               _put(p["xy"]), _put(p["valid"]),
                               _put(p["colors"]), p["counts"])
                else:
                    payload = (_put(p["gray_small"]), _put(p["xy"]),
                               _put(p["valid"]), _put(p["colors"]),
                               p["counts"])
                return slots, n, payload
            from ..models.frontend import pack_frames

            gray, small = pack_frames(chunk, self.cfg.color_downscale)
            return slots, n, (_put(gray), _put(small))

        self._staged.append(self._packer.submit(pack_and_put))
        return True

    def _dispatch_host_payload(self, slots, payload):
        """Dispatch the device half of a host-mode chunk (payload layout per
        _stage_chunk's pack_and_put: host_desc-dependent arrays + counts
        last).  Shared by the classic and streaming ingest paths; returns
        the host-side counts."""
        counts = payload[-1]
        if self.cfg.host_desc == "orb":
            words, xy, valid, colors, _ = payload
            self.state = steps.ingest_host_desc(
                self.cfg, self.state, words, xy, valid, colors,
                jnp.asarray(slots))
        elif self.cfg.host_desc == "hybrid":
            gray_small, bits, xy, valid, colors, _ = payload
            self.state = steps.ingest_host_hybrid(
                self.cfg, self.state, gray_small, bits, xy, valid,
                colors, jnp.asarray(slots))
        else:
            gray_small, xy, valid, colors, _ = payload
            self.state = steps.ingest_host(
                self.cfg, self.state, gray_small, xy, valid, colors,
                jnp.asarray(slots))
        return counts

    def _dispatch_ingest(self) -> bool:
        """Dispatch ingest compute for the oldest staged chunk; its counts
        download is collected LATER (one cycle behind) so the extraction-gate
        sync overlaps tracking/BA instead of stalling the fill.  (Host-detect
        mode has host-side counts — no download at all.)"""
        if not self._staged:
            return False
        slots, n, payload = self._staged.pop(0).result()
        if self.cfg.ingest_mode == "host":
            counts = self._dispatch_host_payload(slots, payload)
        else:
            gray, small = payload
            self.state, counts = steps.ingest(
                self.cfg, self.state, gray, small, jnp.asarray(slots))
        self._pending.append((slots, n, counts))
        return True

    def _collect_ingest(self) -> bool:
        """Admit the oldest dispatched chunk's frames (syncs its counts —
        cheap when the ingest ran during the previous tracking cycle)."""
        if not self._pending:
            return False
        slots, n, counts = self._pending.pop(0)
        counts = np.asarray(counts)[:n]
        self._adapt_threshold(counts)
        for i in range(n):
            if counts[i] >= self.required_extracted:
                self.batch.append(int(slots[i]))
            else:
                self._free.append(int(slots[i]))
        for s in slots[n:]:  # padded lanes go straight back
            self._free.append(int(s))
        if self.logs:
            self.logs.main.write(
                "Features count in frames added to batch: "
                + " ".join(str(int(c)) for c in counts
                           if c >= self.required_extracted)
                + f"\nBatch size: {len(self.batch)}\n")
        return True

    def _adapt_threshold(self, counts: np.ndarray) -> None:
        """Adaptive extraction gate (host ingest): when a chunk's post-NMS
        corner counts sag below ``requiredExtractedPointsCount`` the static
        admission gate (batch.cpp:242-247) would drop every frame and force
        a track-loss restart on feature-sparse stretches — so lower the FAST
        threshold for subsequent chunks, bounded at 1/4 of the configured
        value, and raise it back (never above the configured value) once
        counts recover.  Every change is logged to main.txt.  A healthy
        scene never trips either edge, so benchmark behaviour is unchanged."""
        if (not self.cfg.adaptive_threshold or self.cfg.ingest_mode != "host"
                or len(counts) == 0):
            return
        med = float(np.median(counts))
        thr = self._fast_threshold
        if med < self.required_extracted and thr > self._fast_floor:
            new = max(self._fast_floor, round(thr * 0.75))
        elif (med > 4.0 * self.required_extracted
              and thr < self.cfg.threshold):
            new = min(float(self.cfg.threshold), round(thr / 0.75))
        else:
            return
        if new == thr:
            return
        self._fast_threshold = new
        if self.logs:
            self.logs.main.write(
                f"Adaptive FAST threshold: {thr:g} -> {new:g} "
                f"(median corners {med:g} vs required "
                f"{self.required_extracted})\n")

    def fill(self, target: int | None = None) -> None:
        t0 = ChronoTimer()
        filled = False
        # fill past framesBatchSize by one BA window of headroom: the scan
        # consumes ~1 frame/step, and every step must still see a FULL
        # batch_size candidate window (advance_window's `visible`).  Without
        # the headroom the late scan steps' candidate sets depend on ingest
        # chunk phase — nondeterministic across kill-and-resume.
        # (The streaming bootstrap instead passes target=batch_size — see
        # _bootstrap.)
        if target is None:
            target = self.batch_size + self.cfg.window
        while len(self.batch) < target:
            # keep the wire fed before any blocking download
            while len(self._staged) < 3 and self._stage_chunk():
                pass
            if not self._pending and not self._dispatch_ingest():
                break
            self._collect_ingest()
            filled = True
        # prefetch pipeline for the next cycle: one chunk's ingest in flight
        # (runs while we track/BA) and two more chunks' bytes on the wire
        # (the initial fill is upload-bound through the tunnel)
        while len(self._staged) < 3 and self._stage_chunk():
            pass
        if not self._pending:
            self._dispatch_ingest()
        if filled and self.logs:
            # reference: "MS for batch's filling:" (batch.cpp:265)
            t0.print_start_delta("MS for batch's filling: ", self.logs.time)

    def _consume_through(self, pos: int) -> int:
        """Free ring slots head..pos, return the chosen slot."""
        chosen = self.batch[pos]
        for s in self.batch[: pos + 1]:
            if s != chosen:
                self._free.append(s)
        self.batch = self.batch[pos + 1 :]
        return chosen

    def _release(self, slot: int) -> None:
        self._free.append(slot)

    # ------------------------------------------------------------ main cycle
    def _find_first_good_frame(self, init_R, init_t) -> bool:
        while True:
            if self.batch:
                slot = self._consume_through(0)
                self._prev_fid = self._slot_frame.get(slot, -1)
                self.state = steps.set_prev_from_slot(
                    self.cfg, self.state, jnp.asarray(slot, jnp.int32),
                    jnp.asarray(init_R, jnp.float32),
                    jnp.asarray(init_t, jnp.float32))
                self._release(slot)
                return True
            if self._pending:
                self._collect_ingest()
                continue
            if not self._staged and not self._stage_chunk():
                return False
            self._dispatch_ingest()
            self._collect_ingest()

    def _match_select(self):
        B = self.batch_size + max(self.cfg.fill_chunk, self.cfg.window)
        order = np.zeros(B, np.int32)
        mask = np.zeros(B, bool)
        # candidate window capped at framesBatchSize — reference batch
        # semantics AND resume determinism (see advance_window's `visible`)
        n = min(len(self.batch), self.batch_size)
        order[:n] = self.batch[:n]
        mask[:n] = True
        train_all, mask_all, info, counts = steps.match_select(
            self.cfg, self.state, jnp.asarray(order), jnp.asarray(mask))
        info = np.asarray(info)
        if self.logs:
            cc = self._host_np(counts)[:n]
            for bi in range(n - 1, self.cfg.skip_from_head - 1, -1):
                self.logs.main.write(
                    f"Batch index: {bi}; matched {int(cc[bi])}\n")
        return train_all, mask_all, int(info[0]), int(info[1])

    def _bootstrap(self, init_R, init_t) -> bool:
        self._trace("bootstrap: find first")
        if not self._find_first_good_frame(init_R, init_t):
            return False
        self._trace("bootstrap: first frame set")
        # streaming: the first-pair search scans exactly one reference batch
        # (defineFirstPairFrames fills framesBatchSize, batch.cpp:228-267);
        # the steady loop tops the queue up to its own throttle while the
        # bootstrap math runs instead of idling on the wire here
        import os as _os

        boot_target = self.batch_size if self._will_stream else None
        if _os.environ.get("SLAM_TPU_BOOT_TARGET_FULL"):
            boot_target = None  # debug A/B: classic batch+window target
        while True:
            self.fill(target=boot_target)
            self._trace(f"bootstrap: filled batch={len(self.batch)}")
            if not self.batch:
                return False
            train_all, mask_all, found, pos = self._match_select()
            self._trace(f"bootstrap: match_select found={found}")
            if not found:
                # promote batch head to first frame (mainCycle.cpp:299-315)
                slot = self._consume_through(0)
                self._prev_fid = self._slot_frame.get(slot, -1)
                self.state = steps.set_prev_from_slot(
                    self.cfg, self.state, jnp.asarray(slot, jnp.int32),
                    jnp.asarray(init_R, jnp.float32),
                    jnp.asarray(init_t, jnp.float32))
                self._release(slot)
                continue
            slot = self._consume_through(pos)
            second_fid = self._slot_frame.get(slot, -1)
            train = train_all[pos]
            mask = mask_all[pos]
            self.state, out = steps.bootstrap_step(
                self.cfg, self.state, jnp.asarray(slot, jnp.int32),
                train, mask, self._next_key())
            self._release(slot)
            out_np = np.asarray(out)
            ok, chir, n_pass, n_new, n_matches, R2, t2 = self._unpack(out_np)
            self._trace("bootstrap: bootstrap_step done")
            if self.logs:
                self.logs.main.write(
                    f"Points passed chirality check count: {chir}\n")
                # restart-rescue audit trailer (steps.bootstrap_step):
                # logged at every restart (retained map non-empty), with
                # the per-gate funnel so a non-firing rescue is auditable
                if out_np.shape[0] > 17 and out_np[21] > 0:
                    self.logs.main.write(
                        f"Restart re-bind: {int(out_np[18])} landmarks "
                        f"shared with the retained map "
                        f"(radius-pass {int(out_np[19])}, ratio-pass "
                        f"{int(out_np[20])}, map {int(out_np[21])}); "
                        f"bootstrap baseline rescaled by {out_np[17]:.4f}\n")
            self._log_pose(np.asarray(init_R), np.asarray(init_t))
            self._log_pose(R2, t2)
            self.trajectory_R.extend([np.asarray(init_R, np.float64), R2])
            self.trajectory_t.extend([np.asarray(init_t, np.float64), t2])
            self._win_ids = [self._prev_fid, second_fid]
            self._prev_fid = second_fid
            self._win_fill = 2
            self.frames_accepted += 2
            return True

    def _log_append_ba(self, out: np.ndarray, fill: int, ids: list,
                       gd: GlobalData, timer: ChronoTimer):
        """Parse one packed BA stats/poses vector (steps.ba_packed_len
        layout), write the reference-format statistics lines, and append
        the flushed (post-BA) cameras — shared by the classic deferred
        collect and the streaming in-scan flush."""
        F = self.cfg.window
        cams = out[4:4 + F * 6].reshape(F, 6)
        Rmats = out[4 + F * 6:].reshape(F, 3, 3)
        if self.logs:
            self.logs.main.write(
                "Bundle Adjustment statistics (approximated RMSE):\n"
                f" #residuals: {int(out[2])}\n"
                f" Initial RMSE: {out[0]:.6f}\n"
                f" Final RMSE: {out[1]:.6f}\n")
            timer.print_last_point_delta("Bundle adjustment: ", self.logs.time)
            timer.update_last_point()
        for i in range(fill):
            fid = ids[i] if i < len(ids) else -1
            gd.append_cameras(Rmats[i][None], cams[i, 3:][None], [fid])
            self.flushed_R.append(Rmats[i])
            self.flushed_t.append(cams[i, 3:])
            self.flushed_ids.append(fid)

    def _collect_ba(self, gd: GlobalData, timer: ChronoTimer):
        """Download + log a previously dispatched ba_step (deferred so the
        ~28 ms relay sync and the stats download ride behind the next
        window's fill/advance dispatches instead of stalling them)."""
        if self._ba_pending is None:
            return
        out, fill, ids = self._ba_pending
        self._ba_pending = None
        out = np.asarray(out.result(), np.float64)  # ~1KB, downloaded async
        self._log_append_ba(out, fill, ids, gd, timer)

    def _flush_window(self, gd: GlobalData, timer: ChronoTimer):
        """BA (if enabled) then move window poses to the trajectory
        (moveProcessedDataToGlobalStruct semantics).  The BA dispatch is
        asynchronous: its stats/poses download is collected at the next
        flush (or end of run); the device-side state dependency sequences
        the compute correctly without a host sync."""
        self._collect_ba(gd, timer)
        if self._win_fill == 0:
            return
        if self.collect_global_obs:
            # device copies first: ba_step donates the state, so the window
            # buffers may be reused by XLA the moment it is dispatched — the
            # copies stay valid for the async download on the packer thread
            xy_c = self.state.win_xy + 0.0
            corr_c = self.state.win_corr + 0
            fut = self._packer.submit(
                lambda a=xy_c, b=corr_c: (np.asarray(a), np.asarray(b)))
            self._global_obs.append((fut, self._win_fill, list(self._win_ids)))
        if self.cfg.use_ba and self._win_fill >= 2:
            self.state, out = steps.ba_step(
                self.cfg, self.state, jnp.asarray(self._win_fill, jnp.int32))
            # download in a packer thread: the ~28 ms relay round-trip rides
            # behind the next window's dispatches instead of blocking collect
            self._ba_pending = (self._packer.submit(np.asarray, out),
                                self._win_fill, list(self._win_ids))
        else:
            # no BA: poses were logged at acceptance; replay from logs-side
            # cache kept on host
            for i, (R, t) in enumerate(zip(
                    self.trajectory_R[-self._win_fill:],
                    self.trajectory_t[-self._win_fill:])):
                ids = self._win_ids
                fid = ids[i] if i < len(ids) else -1
                gd.append_cameras(np.asarray(R)[None], np.asarray(t)[None],
                                  [fid])
                self.flushed_R.append(np.asarray(R, np.float64))
                self.flushed_t.append(np.asarray(t, np.float64))
                self.flushed_ids.append(fid)
        self._win_fill = 0
        self._win_ids = []

    def _maybe_checkpoint(self, gd: GlobalData, timer: ChronoTimer):
        """Snapshot at a window boundary (called right after a flush, when
        the BA window is empty and consumption is at a clean frame-id
        cursor — see checkpoint.py for the resume contract)."""
        if (self.checkpoint_path and self.checkpoint_every > 0
                and self.frames_accepted - self._last_checkpoint_at
                >= self.checkpoint_every):
            from .checkpoint import save_checkpoint

            # settle the just-dispatched window BA so the snapshot's flushed
            # trajectory covers every accepted frame — otherwise the
            # in-flight window's poses would exist in neither the snapshot
            # nor the resumed run's output
            self._collect_ba(gd, timer)
            save_checkpoint(self.checkpoint_path, self)
            self._last_checkpoint_at = self.frames_accepted
            if self.logs:
                self.logs.main.write(
                    f"Checkpoint saved at {self.frames_accepted} frames\n")

    # ------------------------------------------------------ streaming loop
    #
    # The classic loop below syncs one ~1 KB status download per window
    # before it can dispatch the next one — ~28 ms relay round trip plus
    # host bookkeeping on the critical path (measured ~55 ms/window).  The
    # streaming loop keeps the candidate queue's cursors ON DEVICE
    # (steps.queue_append / steps.advance_stream, which also solves the
    # windowed BA in-scan), dispatches window after window back-to-back, and
    # processes each dispatch's status rows 1-2 dispatches LATE from a
    # background download — logging, trajectory, and stop decisions all
    # tolerate the lag, and the device never waits for the host.

    def _dispatch_stream_ingest(self, force: bool = False) -> bool:
        """Pop the oldest staged chunk, dispatch its ingest + device-queue
        append, and admit host-side (host-mode counts are host-resident).
        Non-blocking unless ``force`` — an unfinished pack is left staged."""
        if not self._staged:
            return False
        if not force and not self._staged[0].done():
            return False
        t0 = ChronoTimer()
        slots, n, payload = self._staged.pop(0).result()
        self._trace(f"ingest dispatch chunk n={n}")
        counts = np.asarray(self._dispatch_host_payload(slots, payload))
        C = len(slots)
        admit = np.zeros(C, bool)
        admit[:n] = counts[:n] >= self.required_extracted
        self._q_dev, self._qlen_dev = steps.queue_append(
            self._q_dev, self._qhead_dev, self._qlen_dev,
            jnp.asarray(slots), jnp.asarray(admit))
        for i in range(C):
            s = int(slots[i])
            if admit[i]:
                self.batch.append(s)
                self._adm_total += 1
            else:
                self._free.append(s)
        if self.logs:
            self.logs.main.write(
                "Features count in frames added to batch: "
                + " ".join(str(int(c)) for c in counts[:n]
                           if c >= self.required_extracted)
                + f"\nBatch size: {len(self.batch)}\n")
            t0.print_start_delta("MS for batch's filling: ", self.logs.time)
        return True

    def _fill_streaming(self) -> bool:
        progressed = False
        T = self.cfg.window
        C = self.cfg.fill_chunk
        # Admission budget, measured from PROCESSED consumption.  The
        # dispatch throttle needs adm − cons − T·inflight ≥ batch_size+T, so
        # with cons knowledge lagging by `depth` dispatches and up to 3
        # chunks sitting staged (counted below — they admit next), staged +
        # admitted must be allowed to run (batch_size+T) + T·depth + 3C
        # ahead of processed consumption; capping tighter starves the
        # dispatch pipeline into lock-step with the collector (measured
        # 25→13 fps).  Beyond that, staging stops: unbounded racing of the
        # media cursor wastes upload on an interrupt and makes periodic
        # checkpoints lag the staged frontier by dozens of frames.
        lookahead = (self._adm_total - self._cons_known
                     + C * len(self._staged))
        limit = (self.batch_size + T) + T * self._stream_depth + 3 * C
        while (lookahead < limit and len(self._staged) < 3
               and self._stage_chunk()):
            progressed = True
            lookahead += C
        if self._dispatch_stream_ingest():
            progressed = True
        return progressed

    def _init_device_queue(self) -> None:
        """Upload the host batch mirror as the initial device queue (called
        once, after bootstrap; later appends ride queue_append)."""
        Q = self.cfg.ring
        q = np.zeros(Q, np.int32)
        q[: len(self.batch)] = self.batch
        self._q_dev = jnp.asarray(q)
        self._qhead_dev = jnp.zeros((), jnp.int32)
        self._qlen_dev = jnp.asarray(len(self.batch), jnp.int32)
        self._winfill_dev = jnp.asarray(self._win_fill, jnp.int32)
        self._dead_dev = jnp.zeros((), bool)
        self._adm_total = len(self.batch)
        self._cons_known = 0
        self._inflight = []

    _TRACE = bool(__import__("os").environ.get("SLAM_TPU_STREAM_TRACE"))

    def _trace(self, msg: str) -> None:
        if self._TRACE:
            import sys
            import time as _t

            print(f"[stream {_t.perf_counter():.3f}] {msg}",
                  file=sys.stderr, flush=True)

    def _dispatch_advance_stream(self, tail: bool = False) -> None:
        T = self.cfg.window
        self._key, *subs = jax.random.split(self._key, T + 1)
        keys = jnp.stack(subs)
        self._trace(f"dispatch adv (inflight={len(self._inflight)})")
        (self.state, self._qhead_dev, self._qlen_dev, self._winfill_dev,
         self._dead_dev, packed, ba_vec, obs_xy, obs_corr) = \
            steps.advance_stream(
                self.cfg, self.state, self._q_dev, self._qhead_dev,
                self._qlen_dev, self._winfill_dev, self._dead_dev, keys, T,
                visible=self.batch_size,
                collect_obs=self.collect_global_obs,
                tail=jnp.asarray(bool(tail)))
        fut = self._packer.submit(
            lambda p=packed, b=ba_vec, ox=obs_xy, oc=obs_corr:
            (np.asarray(p), np.asarray(b), np.asarray(ox), np.asarray(oc)))
        self._inflight.append(fut)

    def _finalize_stream_window(self, ba_vec, obs, gd: GlobalData,
                                timer: ChronoTimer):
        """Process one in-scan window flush: BA stats logging + flushed
        (post-BA) camera append for the F frames in self._win_ids."""
        F = self.cfg.window
        ids = list(self._win_ids[:F])
        if self.collect_global_obs and obs is not None:
            from concurrent.futures import Future

            f = Future()
            f.set_result(obs)
            self._global_obs.append((f, F, ids))
        if self.cfg.use_ba:
            self._log_append_ba(np.asarray(ba_vec, np.float64), F, ids,
                                gd, timer)
        else:
            for i, (R, t) in enumerate(zip(self.trajectory_R[-F:],
                                           self.trajectory_t[-F:])):
                fid = ids[i] if i < len(ids) else -1
                gd.append_cameras(np.asarray(R)[None], np.asarray(t)[None],
                                  [fid])
                self.flushed_R.append(np.asarray(R, np.float64))
                self.flushed_t.append(np.asarray(t, np.float64))
                self.flushed_ids.append(fid)
        self._win_ids = self._win_ids[F:]

    def _collect_process(self, gd: GlobalData, timer: ChronoTimer):
        """Collect the OLDEST in-flight dispatch and process its status rows
        (trajectory, logs, window flushes, slot frees).  Returns a stop
        status string, or None to continue."""
        if not self._inflight:
            return None
        import time as _t

        t0 = _t.perf_counter()
        packed, ba_vec, obs_xy, obs_corr = self._inflight.pop(0).result()
        self._trace(f"collect waited {(_t.perf_counter()-t0)*1e3:.0f} ms; "
                    f"row0=[act={packed[0,0]:.0f} fnd={packed[0,1]:.0f} "
                    f"ql={packed[0,22]:.0f}] adm={self._adm_total} "
                    f"cons={self._cons_known}")
        T = packed.shape[0]
        win_ms = 0.0
        n_active = int((packed[:, 0] > 0.5).sum())
        if self.logs and n_active:
            # fused window: wall time is not separable per index — the
            # per-frame telemetry mode (classic loop) gives true per-index
            # measurements; here the lines keep reference format with the
            # collect-interval share (engine docstring documents this)
            win_ms = timer.last_point_delta_ms() / max(n_active, 1)
            timer.update_last_point()
        obs = None
        if self.collect_global_obs and obs_xy.size:
            obs = (obs_xy, obs_corr)
        for t in range(T):
            row = packed[t]
            if row[0] < 0.5:          # inactive: queue drained / dead
                break
            if self.logs:
                idx = int(row[2]) if row[1] > 0.5 else FRAME_NOT_FOUND
                self.logs.time.write(
                    f"Matching time for index {idx} : {win_ms:.0f}\n")
            if row[1] < 0.5:          # FRAME_NOT_FOUND
                if self.logs:
                    self.logs.main.write(
                        "No good frames in batch. Interrupt video processing\n")
                return "interrupted"
            good = int(row[2])
            # per-skip cause lines (batch.cpp:93-98: head candidates with
            # fewer matches than the chosen frame are legally consumed
            # unused) — makes every "skipped camera" in the final count
            # auditable from main.txt
            if self.logs and good > 0:
                for i in range(good):
                    sfid = self._slot_frame.get(self.batch[i], -1)
                    if self.cfg.use_first_fit:
                        why = (f"matched {int(row[24 + i])}; first-fit rule "
                               f"chose index {good}")
                    else:
                        why = (f"matched {int(row[24 + i])} < best "
                               f"{int(row[3])} at index {good}")
                    self.logs.main.write(
                        f"Skipped candidate at batch index {i} (frame "
                        f"{sfid}): {why}\n")
            slot = self._consume_through(good)
            fid = self._slot_frame.get(slot, -1)
            self._release(slot)
            self._cons_known += good + 1
            ok, n_corr, n_inl, n_new, n_matches, R, tv = \
                self._unpack(row[4:21])
            if not ok:
                if self.logs:
                    self.logs.main.write(
                        "Not enough corresponding points for solvePnP RANSAC\n")
                return "interrupted"
            if self.logs:
                self.logs.main.write(
                    f"Batch index: {good}; matched {int(row[3])}\n"
                    f"Used in solvePnP: {n_corr}\n")
            self._log_pose(R, tv)
            self.trajectory_R.append(R)
            self.trajectory_t.append(tv)
            self._win_ids.append(fid)
            self._prev_fid = fid
            self._win_fill = int(row[21])
            self.frames_accepted += 1
            if row[23] > 0.5:         # in-scan window flush on this step
                self._finalize_stream_window(ba_vec, obs, gd, timer)
        return None

    def run_streaming(self, init_R=None, init_t=None,
                      resume: bool = False) -> dict:
        """Streaming main loop (see class docstring of this section)."""
        timer = ChronoTimer()
        init_R = np.eye(3) if init_R is None else init_R
        init_t = np.zeros(3) if init_t is None else init_t
        gd = GlobalData()
        resumed = resume and self.frames_accepted > 0
        self._trace("run_streaming enter")
        if not resumed:
            self.trajectory_R, self.trajectory_t = [], []
            if not self._bootstrap(init_R, init_t):
                return {"status": "no_data", "global_data": gd,
                        "frames_accepted": 0, "last_pose": None}
        self._trace("bootstrap done")
        # settle any classic-path prefetches from bootstrap, then hand the
        # queue to the device
        while self._staged or self._pending:
            if not self._pending:
                self._dispatch_ingest()
            self._collect_ingest()
        self._init_device_queue()
        self._trace("queue initialized")
        T = self.cfg.window
        need = self.batch_size + T     # full candidate window at every step
        status = None
        while status is None:
            # opportunistic collection: process any dispatch whose download
            # already landed (keeps host knowledge fresh; on a fast device
            # acceptance trails ingest closely, on the relay the normal
            # depth-triggered collect applies)
            while (status is None and self._inflight
                   and self._inflight[0].done()):
                status = self._collect_process(gd, timer)
            if status is not None:
                break
            status = self._maybe_stream_checkpoint(gd, timer)
            if status is not None:
                break
            self._fill_streaming()
            q_min = (self._adm_total - self._cons_known
                     - T * len(self._inflight))
            tail_ok = (self._media_over and not self._staged
                       and not self._pending and q_min > 0)
            if q_min >= need or tail_ok:
                self._dispatch_advance_stream(tail=tail_ok)
                if len(self._inflight) > self._stream_depth:
                    status = self._collect_process(gd, timer)
                continue
            if self._inflight:
                status = self._collect_process(gd, timer)
                continue
            if self._staged:
                self._dispatch_stream_ingest(force=True)
                continue
            if self._media_over:
                status = "video_over"
                break
            # media not over, nothing staged, nothing in flight: ring full
            # with nothing consumable — cannot happen with the sized ring
            status = "interrupted"
        self._trace(f"stream loop done ({status})")
        # drain remaining in-flight dispatches (their rows may carry
        # accepted frames and flushes issued before the stop)
        while self._inflight:
            s2 = self._collect_process(gd, timer)
            status = s2 if status in (None, "video_over") and s2 else status
        # final partial-window flush through the classic path
        self._flush_window(gd, timer)
        self._collect_ba(gd, timer)
        last_pose = None
        if len(self.trajectory_R):
            last_pose = (self.trajectory_R[-1], self.trajectory_t[-1])
        return {"status": status or "video_over", "global_data": gd,
                "frames_accepted": self.frames_accepted,
                "last_pose": last_pose}

    def _maybe_stream_checkpoint(self, gd: GlobalData, timer: ChronoTimer):
        """Checkpoint in streaming mode: drain every in-flight dispatch so
        host knowledge == device state, then snapshot (any drained point is
        a valid resume point — the media cursor re-pulls everything not yet
        consumed).  Returns a stop status surfaced during the drain, else
        None."""
        if not (self.checkpoint_path and self.checkpoint_every > 0
                and self.frames_accepted - self._last_checkpoint_at
                >= self.checkpoint_every):
            return None
        while self._inflight:
            s = self._collect_process(gd, timer)
            if s is not None:
                return s
        from .checkpoint import save_checkpoint

        save_checkpoint(self.checkpoint_path, self)
        self._last_checkpoint_at = self.frames_accepted
        if self.logs:
            self.logs.main.write(
                f"Checkpoint saved at {self.frames_accepted} frames\n")
        return None

    def run(self, init_R=None, init_t=None, resume: bool = False) -> dict:
        """Main loop.  ``resume=True`` continues from a ``load_checkpoint``ed
        state: bootstrap is skipped (the restored prev-frame features and
        pose anchor tracking directly) and the restored trajectory is kept.

        Dispatches to the streaming loop (device-held queue, in-scan BA,
        host trailing 1-2 dispatches) when the config allows; the classic
        per-window loop remains for device ingest, meshed runs, and the
        per-frame telemetry mode."""
        if self._will_stream:
            return self.run_streaming(init_R, init_t, resume)
        timer = ChronoTimer()
        init_R = np.eye(3) if init_R is None else init_R
        init_t = np.zeros(3) if init_t is None else init_t
        gd = GlobalData()
        resumed = resume and self.frames_accepted > 0
        if not resumed:
            self.trajectory_R, self.trajectory_t = [], []
            if not self._bootstrap(init_R, init_t):
                return {"status": "no_data", "global_data": gd,
                        "frames_accepted": 0, "last_pose": None}
        status = "interrupted"
        B = self.batch_size + max(self.cfg.fill_chunk, self.cfg.window)
        while True:
            self.fill()
            if not self.batch:
                status = "video_over"
                break
            if self._win_fill >= self.cfg.window:
                self._flush_window(gd, timer)
                self._maybe_checkpoint(gd, timer)
            # windowed device loop: up to (window - win_fill) frames tracked
            # in ONE dispatch + ONE ~1KB download.  t_steps is always the
            # full window so exactly ONE advance_window program ever
            # compiles; steps past the window fill are gated no-ops on
            # device (only reached in the first window after a bootstrap,
            # where win_fill=2 — two wasted gated iterations per restart).
            # Per-frame telemetry mode instead dispatches ONE step at a
            # time, so every "Matching time for index N" line below is a
            # true wall-clock measurement of that step's dispatch.
            T = 1 if self.cfg.per_frame_telemetry else self.cfg.window
            queue = np.zeros(B, np.int32)
            nq = min(len(self.batch), B)
            queue[:nq] = self.batch[:nq]
            self._key, *subs = jax.random.split(self._key, T + 1)
            keys = jnp.stack(subs)
            t_adv = ChronoTimer()
            self.state, packed, _qh, _ql = steps.advance_window(
                self.cfg, self.state, jnp.asarray(queue),
                jnp.asarray(0, jnp.int32), jnp.asarray(nq, jnp.int32),
                jnp.asarray(self._win_fill, jnp.int32), keys, T,
                visible=self.batch_size)
            packed = np.asarray(packed)
            # per-index "Matching time" lines (batch.cpp:155-157 format): in
            # per-frame telemetry mode (T=1) each line is the measured wall
            # time of that single step's dispatch; in the fused mode the
            # window runs as ONE dispatch, so the wall time is apportioned
            # equally over the steps that actually scanned the batch —
            # time.txt stays line-for-line comparable with the reference
            # logs (one line per chosen index, FRAME_NOT_FOUND=-2 on the
            # failed scan)
            win_ms = t_adv.start_delta_ms()
            n_active = int((packed[:, 0] > 0.5).sum())
            share_ms = win_ms / max(n_active, 1)

            stop = None
            for tstep in range(T):
                row = packed[tstep]
                if row[0] < 0.5:          # inactive: queue drained
                    break
                if self.logs:
                    idx = int(row[2]) if row[1] > 0.5 else FRAME_NOT_FOUND
                    self.logs.time.write(
                        f"Matching time for index {idx} : {share_ms:.0f}\n")
                if row[1] < 0.5:          # FRAME_NOT_FOUND
                    stop = "interrupted"
                    if self.logs:
                        self.logs.main.write(
                            "No good frames in batch. Interrupt video processing\n")
                    break
                good = int(row[2])
                slot = self._consume_through(good)
                fid = self._slot_frame.get(slot, -1)
                self._release(slot)
                ok, n_corr, n_inl, n_new, n_matches, R, t = self._unpack(row[4:21])
                if not ok:
                    stop = "interrupted"
                    if self.logs:
                        self.logs.main.write(
                            "Not enough corresponding points for solvePnP RANSAC\n")
                    break
                if self.logs:
                    self.logs.main.write(
                        f"Batch index: {good}; matched {int(row[3])}\n"
                        f"Used in solvePnP: {n_corr}\n")
                self._log_pose(R, t)
                self.trajectory_R.append(R)
                self.trajectory_t.append(t)
                self._win_ids.append(fid)
                self._prev_fid = fid
                self._win_fill += 1
                self.frames_accepted += 1
            if stop is not None:
                status = stop
                break

        self._flush_window(gd, timer)
        self._collect_ba(gd, timer)
        last_pose = None
        if len(self.trajectory_R):
            last_pose = (self.trajectory_R[-1], self.trajectory_t[-1])
        return {"status": status, "global_data": gd,
                "frames_accepted": self.frames_accepted, "last_pose": last_pose}

    def global_observations(self):
        """All flushed windows' (xy [f,K,2], corr [f,K], frame ids) — the
        observation record the final global BA consumes."""
        out = []
        for fut, fill, ids in self._global_obs:
            xy, corr = fut.result()
            out.append((xy[:fill], corr[:fill], ids[:fill]))
        return out

    # ----------------------------------------------------------- final data
    def snapshot_map(self) -> tuple[np.ndarray, np.ndarray]:
        """One bulk download of the reconstructed map at end of run."""
        n = int(np.asarray(self.state.map_count))
        pts = np.asarray(self.state.map_points[:n], np.float64)
        cols = np.clip(np.asarray(self.state.map_colors[:n]), 0, 255).astype(np.uint8)
        return pts, cols

    @property
    def K_host(self) -> np.ndarray:
        K4 = np.asarray(self.state.K4, np.float64)
        return np.array([[K4[0], 0, K4[2]], [0, K4[1], K4[3]], [0, 0, 1.0]])

    @property
    def media_exhausted(self) -> bool:
        return (self._media_over and not self.batch and not self._staged
                and not self._pending)
