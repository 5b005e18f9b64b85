from gnn_computing_tpu.ops.spmm import (
    spmm,
    spmm_xla,
    spmm_transpose_xla,
    sddmm_slots_xla,
    slots_from_edge_values,
    edge_values_from_slots,
)
from gnn_computing_tpu.ops.sddmm import sddmm
from gnn_computing_tpu.ops.gat import (
    gat_aggregate,
    gat_split_forward,
    att_gat,
    u_add_v,
    add_to_center,
    div_each,
    leaky_relu,
)
from gnn_computing_tpu.ops.bcsr import (
    bcsr_spmm,
    bcsr_spmm_xla,
    hybrid_spmm,
)
from gnn_computing_tpu.ops.bcsr_gat import gat_bcsr, hybrid_gat
from gnn_computing_tpu.ops.edge_mlp import edge_mlp
from gnn_computing_tpu.ops.fused_nn import spmm_nn
from gnn_computing_tpu.ops.lstm import (
    LSTMParams,
    init_lstm_params,
    lstm_aggregate,
    lstm_cell,
)

__all__ = [
    "spmm",
    "spmm_xla",
    "spmm_transpose_xla",
    "sddmm",
    "sddmm_slots_xla",
    "slots_from_edge_values",
    "edge_values_from_slots",
    "gat_aggregate",
    "gat_split_forward",
    "att_gat",
    "u_add_v",
    "add_to_center",
    "div_each",
    "leaky_relu",
    "bcsr_spmm",
    "bcsr_spmm_xla",
    "hybrid_spmm",
    "gat_bcsr",
    "hybrid_gat",
    "edge_mlp",
    "spmm_nn",
    "LSTMParams",
    "init_lstm_params",
    "lstm_aggregate",
    "lstm_cell",
]
