from gnn_computing_tpu.graph.csr import CSRGraph
from gnn_computing_tpu.graph.synthetic import rmat_graph, uniform_graph, fixed_degree_graph
from gnn_computing_tpu.graph.io import load_graph, save_graph, dataset_config

__all__ = [
    "CSRGraph",
    "rmat_graph",
    "uniform_graph",
    "fixed_degree_graph",
    "load_graph",
    "save_graph",
    "dataset_config",
]
