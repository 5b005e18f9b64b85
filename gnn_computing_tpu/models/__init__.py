from gnn_computing_tpu.models.gcn import (
    gcn_layer,
    gcn_forward,
    gcn_forward_bench,
    init_gcn_params,
    BENCH_DIMS,
)
from gnn_computing_tpu.models.gat import (
    gat_layer,
    gat_forward,
    init_gat_params,
    GATLayerParams,
)

__all__ = [
    "gcn_layer",
    "gcn_forward",
    "gcn_forward_bench",
    "init_gcn_params",
    "gat_layer",
    "gat_forward",
    "init_gat_params",
    "GATLayerParams",
    "BENCH_DIMS",
]
