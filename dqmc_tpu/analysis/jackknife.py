"""Jackknife estimators over binned measurements.

Clean-room implementation of the standard delete-1 jackknife used by the
reference analysis pipeline (scripts/analysis.py:232-298): mean over bins,
error = sqrt((n-1)/n * sum_i (theta_i - mean(theta))^2) with theta_i the
delete-1 bin means.  Vectorized over arbitrary trailing array axes
(complex supported).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def jackknife(data: np.ndarray, use_native: bool = False) -> Tuple[float, float]:
    """(mean, error) over a 1D array of bin values.

    use_native routes through the C++ statistics core (dqmc_tpu.native)
    when available — mathematically identical (the delete-1 estimator
    reduces to sqrt(sum (x-mean)^2 / (n(n-1)))), different only in rounding
    order; the numpy path stays the default for bit-compatibility with the
    reference toolchain's output files.
    """
    if use_native:
        from dqmc_tpu import native
        res = native.jackknife_native(np.asarray(data))
        if res is not None:
            return float(res[0]), float(res[1])
    data = np.asarray(data)
    n = len(data)
    if n < 2:
        raise ValueError("Need at least 2 bins for jackknife analysis")
    full_mean = data.mean()
    theta = (n * full_mean - data) / (n - 1)
    var = ((theta - theta.mean()) ** 2).sum() * (n - 1) / n
    return float(full_mean), float(np.sqrt(var))


def jackknife_ratio_array(num: np.ndarray, den: np.ndarray
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """Jackknife of the ratio <num>/<den> over bins (axis 0 of num; den is
    the matching (n,) scalar series).

    The sign-reweighting estimator for sign-prone models: observables are
    accumulated sign-weighted (<O s> per bin) alongside the <s> series, and
    the physical value is <O s>/<s>.  The delete-1 estimator drops bin i
    from BOTH series jointly, which propagates the numerator/denominator
    correlation into the error (a naive error quotient does not).
    Supports scalar (1D num) and array (N-D num) observables; complex
    numerators use direct complex arithmetic like jackknife_array.
    """
    num = np.asarray(num)
    den = np.asarray(den, dtype=np.float64)
    n = num.shape[0]
    if n < 2:
        raise ValueError("Need at least 2 bins for jackknife analysis")
    if den.shape != (n,):
        raise ValueError("denominator series must be (n_bins,)")
    mean = num.mean(axis=0) / den.mean()
    loo_num = (num.sum(axis=0, keepdims=True) - num) / (n - 1)
    loo_den = (den.sum() - den) / (n - 1)
    theta = loo_num / loo_den.reshape((n,) + (1,) * (num.ndim - 1))
    var = ((theta - theta.mean(axis=0, keepdims=True)) ** 2).sum(axis=0) \
        * (n - 1) / n
    err = np.sqrt(var)
    if num.ndim == 1 and not np.iscomplexobj(num):
        return float(mean), float(err)
    return mean, err


def jackknife_array(data: np.ndarray,
                    use_native: bool = False) -> Tuple[np.ndarray, np.ndarray]:
    """Elementwise jackknife over axis 0 (bins).  Complex data uses direct
    complex arithmetic ((theta - mean)**2, not |theta - mean|^2), matching
    the reference (analysis.py:286-296)."""
    if use_native:
        from dqmc_tpu import native
        res = native.jackknife_native(np.asarray(data))
        if res is not None:
            return res
    data = np.asarray(data)
    n = data.shape[0]
    if n < 2:
        raise ValueError("Need at least 2 bins for jackknife analysis")
    full_mean = data.mean(axis=0)
    theta = (n * full_mean[None] - data) / (n - 1)
    var = ((theta - theta.mean(axis=0)[None]) ** 2).sum(axis=0) * (n - 1) / n
    return full_mean, np.sqrt(var)
