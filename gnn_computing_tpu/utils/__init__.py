from gnn_computing_tpu.utils.timing import benchmark, BenchResult
from gnn_computing_tpu.utils.flops import aggregation_gflops, edges_per_sec
