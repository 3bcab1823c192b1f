"""Nonlinear solvers: windowed Levenberg–Marquardt bundle adjustment with
Schur-complement reduction (the Ceres replacement)."""

from .ba import BAConfig, WindowedBA, bundle_adjust_window, loss_rho_and_weight

__all__ = ["BAConfig", "WindowedBA", "bundle_adjust_window", "loss_rho_and_weight"]
