from gnn_computing_tpu.parallel.mesh import (
    make_mesh,
    shard_rows,
    shard_ring_plan,
    replicated,
    GRAPH_AXIS,
    FEATURE_AXIS,
)
from gnn_computing_tpu.parallel.partition import (
    RingPlan,
    build_ring_plan,
    pad_to_shards,
)
from gnn_computing_tpu.parallel.ring import (
    ring_spmm,
    ring_gcn_layer,
    ring_gcn_forward,
)

__all__ = [
    "make_mesh",
    "shard_rows",
    "shard_ring_plan",
    "replicated",
    "GRAPH_AXIS",
    "FEATURE_AXIS",
    "RingPlan",
    "build_ring_plan",
    "pad_to_shards",
    "ring_spmm",
    "ring_gcn_layer",
    "ring_gcn_forward",
]
