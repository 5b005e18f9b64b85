"""CLI subcommands + training loop + checkpointing."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnn_computing_tpu.utils.cli import main as cli_main
from gnn_computing_tpu.models import init_gcn_params
from gnn_computing_tpu.models.gcn import gcn_forward
from gnn_computing_tpu.models.training import (
    accuracy,
    load_checkpoint,
    make_train_step,
    save_checkpoint,
)
from gnn_computing_tpu.graph.synthetic import rmat_graph, normal_features
from gnn_computing_tpu.schedule import neighbor_grouping_plan

optax = pytest.importorskip("optax")


def test_cli_info_schedule(capsys):
    cli_main(["info", "--syn", "rmat:256:2048"])
    out = json.loads(capsys.readouterr().out)
    assert out["num_nodes"] == 256 and out["num_edges"] == 2048

    cli_main(["schedule", "--syn", "rmat:256:2048", "--nei", "16"])
    out = json.loads(capsys.readouterr().out)
    assert out["block_size"] == 16
    assert out["num_edges"] == 2048


def test_cli_reorder_presample_roundtrip(tmp_path, capsys):
    # write a small dataset in reference text format, then reorder+presample
    g = rmat_graph(128, 1024, seed=1)
    d = str(tmp_path)
    with open(os.path.join(d, "tiny.config"), "w") as f:
        f.write(f"{g.num_nodes} {g.num_edges}\n")
    with open(os.path.join(d, "tiny.graph"), "w") as f:
        f.write(" ".join(map(str, g.indptr.tolist())) + "\n")
        f.write(" ".join(map(str, g.indices.tolist())) + "\n")

    cli_main(
        ["reorder", "--dataset", "tiny", "--datadir", d, "--threshold", "0.2"]
    )
    out = json.loads(capsys.readouterr().out)
    perm = np.loadtxt(out["output"], dtype=np.int64)
    assert sorted(perm.tolist()) == list(range(g.num_nodes))

    # loader must pick the reorder file up via --reorder subfix
    cli_main(
        [
            "info",
            "--dataset",
            "tiny",
            "--datadir",
            d,
            "--reorder",
            "_thres_0.2",
        ]
    )
    out = json.loads(capsys.readouterr().out)
    assert out["reordered"] is True

    cli_main(
        ["presample", "--dataset", "tiny", "--datadir", d, "--k", "4"]
    )
    out = json.loads(capsys.readouterr().out)
    assert os.path.exists(out["graph"])
    # the presampled graph loads as a fixed-degree dataset
    cli_main(["info", "--dataset", "tiny_sample_4", "--datadir", d])
    out = json.loads(capsys.readouterr().out)
    assert out["num_edges"] == g.num_nodes * 4
    assert out["max_degree"] == 4


def test_training_reduces_loss_and_checkpoints(tmp_path):
    g = rmat_graph(256, 2048, seed=3)
    plan = neighbor_grouping_plan(g, 16).device_put()
    dims = (16, 16, 4)
    params = init_gcn_params(jax.random.key(0), dims)
    h = jnp.asarray(normal_features(g.num_nodes, dims[0], seed=1) * 0.3)
    rng = np.random.default_rng(0)
    labels = jnp.asarray(rng.integers(0, dims[-1], g.num_nodes))
    mask = jnp.asarray(rng.random(g.num_nodes) < 0.7)

    opt = optax.adam(5e-2)
    opt_state = opt.init(params)
    step = make_train_step(lambda p, plan, x: gcn_forward(plan, p, x), opt)

    first = None
    for i in range(30):
        lval, params, opt_state = step(
            params, opt_state, (plan, h), labels, mask
        )
        if first is None:
            first = float(lval)
    assert float(lval) < first, "loss did not decrease"

    acc = accuracy(gcn_forward(plan, params, h), labels, mask)
    assert 0.0 <= float(acc) <= 1.0

    ckpt = os.path.join(str(tmp_path), "ck.npz")
    save_checkpoint(ckpt, params, step=30)
    restored, step_no = load_checkpoint(ckpt, params)
    assert step_no == 30
    for a, b in zip(
        jax.tree_util.tree_leaves(params),
        jax.tree_util.tree_leaves(restored),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
