"""Render the figure-analog results (benchmarks/results/*.jsonl) as PDFs.

The reference's draw_fig*.py layer (B11, SURVEY.md §2d) reduced to one
generic grouped-bar renderer over the JSON-line logs.
"""

import json
import os
import sys
from collections import defaultdict

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")

SPECS = {
    # tag: (group key, bar key, value key, ylabel, lower_is_better)
    "fig7": ("dataset", "model", "seconds", "forward time (s)", True),
    "fig8": ("dataset", "schedule", "actual_s", "aggregation time (s)", True),
    "fig9": ("dataset", "reorder", "dense_coverage", "dense-tile coverage", False),
    "fig10a": ("dataset", None, None, "time (s)", True),
    "fig10b": ("dataset", None, None, "time (s)", True),
    "fig11": ("dataset", "strategy", "seconds", "time (s)", True),
}


def load(tag):
    path = os.path.join(RESULTS, f"{tag}.jsonl")
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def plot(tag):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = load(tag)
    if not rows:
        print(f"{tag}: no results")
        return
    group_key, bar_key, val_key, ylabel, _ = SPECS[tag]
    if bar_key is None:  # fig10a/b: multiple *_s columns per row
        val_cols = [
            k for k in rows[-1] if k.endswith("_s") and k != "ts"
        ]
        data = defaultdict(dict)
        for r in rows:
            for c in val_cols:
                data[r[group_key]][c.replace("_s", "")] = r[c]
    else:
        data = defaultdict(dict)
        for r in rows:
            data[r[group_key]][r[bar_key]] = r[val_key]

    groups = list(data)
    bars = sorted({b for g in data.values() for b in g})
    fig, ax = plt.subplots(figsize=(1.2 + 1.2 * len(groups), 3.2))
    w = 0.8 / max(len(bars), 1)
    for j, b in enumerate(bars):
        xs = [i + j * w for i in range(len(groups))]
        ys = [data[g].get(b, 0.0) for g in groups]
        ax.bar(xs, ys, width=w, label=b)
    ax.set_xticks([i + 0.4 - w / 2 for i in range(len(groups))])
    ax.set_xticklabels(groups, rotation=30, ha="right", fontsize=8)
    ax.set_ylabel(ylabel)
    ax.set_title(tag)
    ax.legend(fontsize=7)
    fig.tight_layout()
    out = os.path.join(RESULTS, f"{tag}.pdf")
    fig.savefig(out)
    print(f"{tag}: {out}")


if __name__ == "__main__":
    tags = sys.argv[1:] or list(SPECS)
    for tag in tags:
        plot(tag)
