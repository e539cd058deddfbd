"""Pade approximant fitting for cheap activation functions.

Equivalent of the reference's offline optimizer (training_tf2/pade.py):
fits a [m/n] rational approximation to tanh (or any odd function) over an
interval, for use in quantized/embedded deployments where transcendentals
are expensive. On TPU the VPU's native tanh is fast, so this is an offline
tool, not a runtime path.
"""

from __future__ import annotations

from typing import Callable, Tuple

import numpy as np


def fit_pade_odd(fn: Callable[[np.ndarray], np.ndarray] = np.tanh,
                 num_order: int = 5, den_order: int = 4,
                 x_max: float = 8.0, n_points: int = 2001
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Least-squares fit of an odd rational p(x)/q(x) to `fn` on [-x_max, x_max].

    p has odd powers up to num_order, q has even powers up to den_order with
    q(0)=1. Returns (p_coeffs ascending odd powers, q_coeffs ascending even
    powers incl. the leading 1).
    """
    x = np.linspace(-x_max, x_max, n_points)
    y = fn(x)
    p_pows = np.arange(1, num_order + 1, 2)
    q_pows = np.arange(2, den_order + 1, 2)
    # linearized LS: p(x) - y*q'(x) = y  where q = 1 + q'
    A = np.concatenate(
        [x[:, None] ** p_pows, -(y[:, None]) * x[:, None] ** q_pows], axis=1)
    coef, *_ = np.linalg.lstsq(A, y, rcond=None)
    p = coef[: len(p_pows)]
    q = np.concatenate([[1.0], coef[len(p_pows):]])
    return p, q


def eval_pade_odd(x: np.ndarray, p: np.ndarray, q: np.ndarray) -> np.ndarray:
    x = np.asarray(x)
    x2 = x * x
    num = np.zeros_like(x, dtype=np.float64)
    for i, c in enumerate(p):
        num = num + c * x * x2 ** i
    den = np.zeros_like(x, dtype=np.float64)
    for i, c in enumerate(q):
        den = den + c * x2 ** i
    return num / den


def tanh_pade_error(num_order: int = 5, den_order: int = 4,
                    x_max: float = 8.0) -> float:
    """Max abs error of the fitted tanh approximation (diagnostic)."""
    p, q = fit_pade_odd(np.tanh, num_order, den_order, x_max)
    x = np.linspace(-x_max, x_max, 10001)
    return float(np.max(np.abs(eval_pade_odd(x, p, q) - np.tanh(x))))
