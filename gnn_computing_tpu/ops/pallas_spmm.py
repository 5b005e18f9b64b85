"""Pallas SpMM kernels (placeholder until TPU probing selects the design).

Strategy selection hooks consumed by ops.spmm.spmm; the kernels land after
on-chip measurement of gather strategies (see bench/probe_gather.py).
"""

from __future__ import annotations


def supported(plan, h) -> bool:
    return False


def preferred(plan, h) -> bool:
    return False


def spmm_pallas(plan, h, val=None):
    raise NotImplementedError("pallas spmm not available yet")
