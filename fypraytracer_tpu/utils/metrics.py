"""Benchmark metrics — the reference's measurement protocol, formalized.

MSE/PSNR semantics match ``MisUtils::ComputeMSE``/``ComputePSNR``
(MisUtils.cpp:118-157): per-channel RGB squared error in 8-bit space,
computed post-tonemap; PSNR = 10·log10(255²/MSE).  We additionally expose
HDR (pre-tonemap) comparisons and a rays/s accounting the reference lacks
(BASELINE.md).
"""

from __future__ import annotations

import numpy as np


def mse_8bit(a: np.ndarray, b: np.ndarray) -> float:
    """8-bit RGB MSE (MisUtils.cpp:118-148). Inputs uint8 (H, W, 3)."""
    if a.shape != b.shape:
        raise ValueError(f"image dims differ: {a.shape} vs {b.shape}")
    d = a.astype(np.float64) - b.astype(np.float64)
    return float(np.mean(d * d))


def psnr(mse: float) -> float:
    """10·log10(255²/MSE) dB (MisUtils.cpp:150-157)."""
    if mse <= 0.0:
        return float("inf")
    return float(10.0 * np.log10(255.0 ** 2 / mse))


def mse_hdr(a: np.ndarray, b: np.ndarray) -> float:
    """Pre-tonemap float MSE (new capability per SURVEY §6)."""
    d = np.asarray(a, np.float64) - np.asarray(b, np.float64)
    return float(np.mean(d * d))


def rays_per_frame(width: int, height: int, samples: int, bounces: int,
                   shadow_rays_per_bounce: int = 0) -> int:
    """W·H·samples·(1 + bounces + shadow rays) (BASELINE.md definition:
    primary + bounce + shadow rays per path)."""
    return width * height * samples * (1 + bounces + shadow_rays_per_bounce * bounces)


def rays_per_second(width: int, height: int, samples: int, bounces: int,
                    frame_time_s: float, shadow_rays_per_bounce: int = 0) -> float:
    return rays_per_frame(width, height, samples, bounces, shadow_rays_per_bounce) / max(frame_time_s, 1e-12)
