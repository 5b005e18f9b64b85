"""Validation: relative-error gates mirroring reference include/spmm.h.

The reference counts elements whose relative error exceeds 1e-2
(``validate2``, spmm.h:11-21) and has a permutation-aware variant comparing a
reordered run against an unreordered reference (``validateReordered``,
spmm.h:23-33).  Tolerance-based (not bitwise) because reduction order differs
between implementations — the reference's atomics had the same property
(SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np

DEFAULT_RTOL = 1e-2  # reference spmm.h:16
# Absolute floor: the reference validator compares two f32 GPU kernels; we
# also validate f32 TPU runs against f64 dense oracles, where catastrophic
# cancellation (terms of magnitude k summing to ~k*1e-7) makes pure relative
# error meaningless.  numpy-style |y - ref| > rtol*|ref| + atol.
DEFAULT_ATOL = 1e-5


def relative_error_count(
    y, y_ref, rtol: float = DEFAULT_RTOL, atol: float = DEFAULT_ATOL
) -> int:
    """Number of elements failing |y - ref| <= rtol*|ref| + atol
    (reference validate2's relative gate plus an absolute floor)."""
    y = np.asarray(y, dtype=np.float64)
    y_ref = np.asarray(y_ref, dtype=np.float64)
    return int(
        (np.abs(y - y_ref) > rtol * np.abs(y_ref) + atol).sum()
    )


def valid(
    y, y_ref, rtol: float = DEFAULT_RTOL, atol: float = DEFAULT_ATOL
) -> bool:
    """Reference ``valid`` host wrapper (spmm.h:35-69): True iff clean."""
    return relative_error_count(y, y_ref, rtol, atol) == 0


def valid_reordered(
    y_reordered, y_ref, rows, rtol: float = DEFAULT_RTOL,
    atol: float = DEFAULT_ATOL,
) -> bool:
    """Compare a run on the reordered graph against an unreordered reference:
    row ``i`` of the reordered output corresponds to original row ``rows[i]``
    (reference validateReordered, spmm.h:23-33, 71-91)."""
    y_ref = np.asarray(y_ref)
    rows = np.asarray(rows, dtype=np.int64)
    return valid(y_reordered, y_ref[rows], rtol, atol)


def assert_valid(
    y, y_ref, rtol: float = DEFAULT_RTOL, atol: float = DEFAULT_ATOL,
    what: str = "",
):
    bad = relative_error_count(y, y_ref, rtol, atol)
    assert bad == 0, f"{what}: {bad} elements exceed rtol={rtol}/atol={atol}"
