"""slam_indoor_code_tpu — a TPU-native monocular SLAM / incremental SfM framework.

A ground-up JAX / XLA / Pallas re-design with the capabilities of the
FIT-2023-SLAM-indoor/slam-indoor-code reference pipeline (C++17 / OpenCV /
Ceres / CUDA).  Nothing is ported: every component is re-architected around
fixed-shape batched array programs so the whole hot path jits onto the TPU's
MXU/VPU, and scales over a `jax.sharding.Mesh`.

Layer map (mirrors SURVEY.md §7 architecture):

- ``config``     — JSON config with field-name parity with the reference
                   schema (reference: src/config/configData.h:73-126).
- ``io``         — txt trajectory/map writers + readers, OpenCV-XML calibration
                   interop, media ingest (reference: src/misc/IOmisc.cpp).
- ``ops``        — fixed-shape feature kernels: FAST detection, ORB/SIFT
                   description, 2-NN matching (jnp reference impls + Pallas
                   fast paths) (reference: src/mainModule/featureExtraction,
                   featureMatching).
- ``geometry``   — batched RANSAC essential-matrix estimation, pose recovery,
                   PnP, DLT triangulation (reference: src/mainModule/translation,
                   triangulation).
- ``solver``     — Levenberg–Marquardt bundle adjustment with Schur complement
                   and robust losses (reference: src/mainModule/bundleAdjustment).
- ``pipeline``   — frame-batch scheduling, incremental SfM main cycle, global
                   map arena (reference: src/mainModule/cycleProcessing).
- ``parallel``   — device meshes, sharded matching, distributed BA collectives
                   (new capability; the reference is single-process).
- ``viz``        — point-cloud / trajectory visualization, clustering, plane
                   fitting, Delaunay meshing (reference: src/vizualization).
- ``calibration``— chessboard intrinsics calibration (reference:
                   src/calibration/cameraCalibration.cpp).
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("SLAM_TPU_PLATFORM"):
    # Select the JAX platform even when the environment pre-imports jax
    # (env vars like JAX_PLATFORMS are read at import time and would be
    # ignored): SLAM_TPU_PLATFORM=cpu forces host execution.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["SLAM_TPU_PLATFORM"])

if not _os.environ.get("SLAM_TPU_NO_COMPILE_CACHE"):
    # Persistent compilation cache: the fused pipeline programs take minutes
    # to compile through a remote-compile TPU tunnel; cache them across
    # processes (SLAM_TPU_CACHE_DIR overrides the location).
    import jax as _jax

    _cache = _os.environ.get(
        "SLAM_TPU_CACHE_DIR",
        _os.path.join(_os.path.dirname(__file__), "..", ".jax_cache"),
    )
    try:
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

if not _os.environ.get("SLAM_TPU_NO_PRECISION_OVERRIDE"):
    # TPU matmuls default to bfloat16 accumulation, which is far too coarse
    # for multiview geometry (SVD/eigh nullspaces, pose chains).  Pin float32
    # matmul precision globally; performance-critical descriptor kernels
    # opt back into lower precision explicitly at their call sites.
    import jax as _jax

    _jax.config.update("jax_default_matmul_precision", "highest")

