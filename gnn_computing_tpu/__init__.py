"""gnn_computing_tpu — a TPU-native GNN message-passing framework.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the PPoPP'21
artifact xxcclong/GNN-Computing (reference mounted at /root/reference): GCN-style
SpMM neighbor aggregation, GAT-style SDDMM edge attention with fused softmax,
GraphSAGE-LSTM per-neighbor aggregation, neighbor-grouping / locality-aware
scheduling, LSH vertex reordering, GPU-style graph sampling — all re-designed
for the TPU hardware model (MXU matmuls, VMEM tiling, ICI collectives) rather
than translated from CUDA.

Layer map (mirrors reference SURVEY.md §1, re-architected):
  graph/     — CSR containers, dataset IO with binary cache, synthetic graphs,
               sampling, LSH reorder, multi-chip partitioning
  schedule/  — neighbor grouping / locality-aware schedules as array transforms
               emitting fixed-shape tiled work (the TPU analog of the
               reference's scheduled-CSR triples)
  ops/       — the operator layer: SpMM, SDDMM, fused GAT, per-edge MLP, LSTM
               gather-gate kernels; each with an XLA strategy and Pallas
               strategies, plus allclose validators
  models/    — GCN / GAT / GraphSAGE-LSTM layers and benchmark models
  parallel/  — device meshes, edge-partitioned multi-chip aggregation with
               halo exchange overlapped via ring collectives
  utils/     — timing, FLOP accounting, CLI/config
"""

__version__ = "0.1.0"

from gnn_computing_tpu.graph.csr import CSRGraph  # noqa: F401
