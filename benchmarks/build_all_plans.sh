#!/bin/bash
# Build every disk cache the round-3 measurement campaign needs, serially
# (ONE CPU on this host — parallel builds thrash).  Each step is a bench.py
# build phase (JAX pinned to CPU inside; never touches the TPU tunnel).
# Safe to re-run: every step exists-checks its caches first.
set -x
cd "$(dirname "$0")/.."
PY="python"

$PY bench.py --phase build                       # headline GCN t24/r512
$PY bench.py --model sddmm --phase build          # NG gather plan b32
$PY bench.py --model sage --phase build           # presample-16
$PY bench.py --train --phase build                # GCN train: r256 + transpose
$PY bench.py --train --model gat --phase build    # GAT train: r512 (no transpose)
$PY bench.py --threshold2 16 --phase build        # denser narrow-layer plan
$PY bench.py --threshold 16 --phase build         # GAT t16 candidate
echo "ALL PLAN BUILDS DONE"
