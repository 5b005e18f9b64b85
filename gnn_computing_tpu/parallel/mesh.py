"""Device meshes for graph-parallel (+ optional tensor-parallel) execution.

Axis conventions:
  "graph"   — vertex/edge shards (the GNN analog of data parallel; rides DCN
              across hosts and ICI within, SURVEY.md §2e).
  "feature" — optional feature-dimension tensor parallelism for wide layers.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

GRAPH_AXIS = "graph"
FEATURE_AXIS = "feature"


def make_mesh(
    num_graph: Optional[int] = None,
    num_feature: int = 1,
    devices=None,
) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    if num_graph is None:
        num_graph = devices.size // num_feature
    assert num_graph * num_feature <= devices.size
    devs = devices[: num_graph * num_feature].reshape(num_graph, num_feature)
    return Mesh(devs, (GRAPH_AXIS, FEATURE_AXIS))


def shard_rows(mesh: Mesh) -> NamedSharding:
    """Row-sharded node features / outputs: [n, f] split over graph axis."""
    return NamedSharding(mesh, P(GRAPH_AXIS, None))


def shard_ring_plan(mesh: Mesh) -> NamedSharding:
    """RingPlan arrays: leading device axis over the graph axis."""
    return NamedSharding(mesh, P(GRAPH_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
