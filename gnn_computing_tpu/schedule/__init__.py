"""Schedule layer: CSR -> fixed-shape tiled aggregation plans.

Re-expresses the reference's Schedule enum {locality, neighbor_grouping,
locality_neighbor_grouping, nop} (graph_schedule.h:8-14) as plan constructors.
"""

import enum

from gnn_computing_tpu.schedule.plan import AggregationPlan, build_plan
from gnn_computing_tpu.schedule.neighbor_grouping import (
    neighbor_grouping_plan,
    nop_plan,
)
from gnn_computing_tpu.schedule.locality import (
    locality_plan,
    locality_neighbor_grouping_plan,
    source_partition_of,
)


class Schedule(enum.Enum):
    """Reference Schedule enum, graph_schedule.h:8-14."""

    locality = "locality"
    neighbor_grouping = "neighbor_grouping"
    locality_neighbor_grouping = "locality_neighbor_grouping"
    nop = "nop"


def make_plan(g, schedule=Schedule.neighbor_grouping, **kw) -> AggregationPlan:
    """Dispatch a schedule by enum — the analog of ``Aggregator::schedule``
    (reference aggregator.h:67-122)."""
    if isinstance(schedule, str):
        schedule = Schedule(schedule)
    if schedule is Schedule.neighbor_grouping:
        return neighbor_grouping_plan(g, **kw)
    if schedule is Schedule.locality:
        kw.setdefault("block_size", None)
        return locality_plan(g, **kw)
    if schedule is Schedule.locality_neighbor_grouping:
        return locality_neighbor_grouping_plan(g, **kw)
    if schedule is Schedule.nop:
        return nop_plan(g, **kw)
    raise ValueError(schedule)


__all__ = [
    "AggregationPlan",
    "Schedule",
    "build_plan",
    "make_plan",
    "neighbor_grouping_plan",
    "nop_plan",
    "locality_plan",
    "locality_neighbor_grouping_plan",
    "source_partition_of",
]
