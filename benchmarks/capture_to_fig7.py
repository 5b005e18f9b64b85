"""Convert bench.py capture rows into fig7.jsonl rows (the full-scale
dataset sweep the plot layer reads — VERDICT r4 #8: citation/ppa/protein
columns).

Takes the LATEST capture row per (model, scale) among gcn3/gat3/sagelstm
metrics and appends fig7-format rows (dataset = "<scale>_scale_rmat",
model GCN/GAT/SAGE-LSTM, seconds, V100 'ours' anchor).  Idempotent-ish:
skips (dataset, model) pairs whose newest fig7 row is already newer than
the capture row.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/capture_to_fig7.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import SCALE_NM  # noqa: E402

RES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")

V100_OURS = {  # draw_fig7.py:68/:75/:84 columns
    ("GCN", "reddit"): 0.058089, ("GAT", "reddit"): 0.055538,
    ("SAGE-LSTM", "reddit"): 0.014204,
    ("GCN", "products"): 0.092553, ("GAT", "products"): 0.113309,
    ("SAGE-LSTM", "products"): None,  # V100 OOM
    ("GCN", "citation"): 0.068879, ("GAT", "citation"): 0.089002,
    ("SAGE-LSTM", "citation"): 0.178892,
    ("GCN", "ppa"): 0.030635, ("GAT", "ppa"): 0.035884,
    ("SAGE-LSTM", "ppa"): 0.035739,
    ("GCN", "protein"): 0.035486, ("GAT", "protein"): 0.034986,
    ("SAGE-LSTM", "protein"): 0.008578,
}
MODEL_NAME = {"gcn": "GCN", "gat": "GAT", "sage": "SAGE-LSTM"}


def main():
    cap = os.path.join(RES, "capture.jsonl")
    fig7 = os.path.join(RES, "fig7.jsonl")
    latest = {}
    with open(cap) as fh:
        for line in fh:
            try:
                r = json.loads(line)
            except json.JSONDecodeError:
                continue
            m = r.get("metric", "")
            model = None
            for k in ("gcn3_", "gat3_", "sagelstm_"):
                if m.startswith(k) and "train" not in m:
                    model = {"gcn3_": "gcn", "gat3_": "gat",
                             "sagelstm_": "sage"}[k]
            if model is None or "time_s" not in r:
                continue
            scale = r.get("scale") or m.split("_scale_")[0].split("_")[-1]
            if scale not in SCALE_NM:
                continue
            key = (model, scale)
            if key not in latest or r["ts"] > latest[key]["ts"]:
                latest[key] = r

    have = {}
    if os.path.exists(fig7):
        with open(fig7) as fh:
            for line in fh:
                try:
                    r = json.loads(line)
                except json.JSONDecodeError:
                    continue
                key = (r.get("dataset"), r.get("model"))
                have[key] = max(have.get(key, 0), r.get("ts", 0))

    added = 0
    with open(fig7, "a") as fh:
        for (model, scale), r in sorted(latest.items()):
            name = MODEL_NAME[model]
            ds = f"{scale}_scale_rmat"
            if have.get((ds, name), 0) >= r["ts"]:
                continue
            n, m_edges = SCALE_NM[scale]
            edges = (
                n * 16 / r["time_s"] if model == "sage"
                else 3 * m_edges / r["time_s"]
            )
            row = {
                "dataset": ds,
                "model": name,
                "seconds": r["time_s"],
                "edges_per_s": edges,
                "v100_ours_seconds": V100_OURS.get((name, scale)),
                "ts": r["ts"],
            }
            fh.write(json.dumps(row) + "\n")
            added += 1
            print(json.dumps(row))
    print(f"appended {added} rows to {fig7}")


if __name__ == "__main__":
    main()
