"""Nonlinear solvers: windowed Levenberg–Marquardt bundle adjustment with
Schur-complement reduction (the Ceres replacement), plus the matrix-free
LM-PCG global refinement for full trajectories."""

from .ba import BAConfig, WindowedBA, bundle_adjust_window, loss_rho_and_weight
from .global_ba import GlobalBAConfig, global_bundle_adjust

__all__ = ["BAConfig", "GlobalBAConfig", "WindowedBA", "bundle_adjust_window",
           "global_bundle_adjust", "loss_rho_and_weight"]
