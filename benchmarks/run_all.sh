#!/bin/bash
# Run every figure-analog benchmark (reference B10 run.sh layer).
# Usage: ./run_all.sh [--quick]
set -e
cd "$(dirname "$0")"
ARGS="$@"
for fig in fig7_models fig8_balance fig9_locality fig10_fusion fig11_sage; do
  echo "=== $fig ==="
  python "$fig.py" $ARGS
done
python plot.py
