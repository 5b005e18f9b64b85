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
# reddit-scale fig7 rows (BASELINE.md anchor scale) from bench.py's cached
# plans — separate fresh process per the measurement discipline; skipped
# in --quick runs and when the cache has not been built yet
if [[ "$ARGS" != *"--quick"* ]] && ls ../data/bench_cache/hybrid_n232965_* >/dev/null 2>&1; then
  echo "=== fig7 reddit-scale ==="
  python fig7_models.py --reddit
fi
python plot.py
