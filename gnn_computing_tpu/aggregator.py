"""Aggregator: the user-facing handle bundling a scheduled graph.

The reference's central object (class Aggregator, aggregator.h:25-151, with
subclasses Aggregator_GCN/GAT/SDDMM/MLP) owns the CSR, its scheduled triple
and edge values, and exposes ``schedule()`` / ``run()`` methods.  The
TPU-native equivalent is an immutable pytree bundling the forward plan, an
optional transposed plan (for fast backward aggregation — a capability the
reference only had hand-written for GAT, aggr_gat.h:222-294), and the edge
correspondence between them.  It passes transparently through jax.jit.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gnn_computing_tpu.graph.csr import CSRGraph
from gnn_computing_tpu.schedule import Schedule, make_plan
from gnn_computing_tpu.schedule.plan import AggregationPlan
from gnn_computing_tpu.schedule.tiles import TilePlan, densify
from gnn_computing_tpu.ops import spmm as spmm_mod
from gnn_computing_tpu.ops.spmm import (
    spmm,
    spmm_bidir,
    slots_from_edge_values,
)
from gnn_computing_tpu.ops import gat as gat_mod
from gnn_computing_tpu.ops.sddmm import sddmm as sddmm_op


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "plan", "plan_t", "edge_map_t", "tile", "tile_t",
        "tile_bits", "tile_bits_t",
    ],
    meta_fields=["num_nodes", "n_src", "num_edges"],
)
@dataclasses.dataclass
class Aggregator:
    plan: AggregationPlan
    plan_t: Optional[AggregationPlan]  # transposed-graph plan (backward)
    # transposed edge i <- original edge edge_map_t[i]
    edge_map_t: Optional[jnp.ndarray]
    num_nodes: int
    n_src: int
    num_edges: int
    # hybrid MXU densification (schedule/tiles.py): when set, `plan` holds
    # only the residual sparse edges and run() adds the dense-tile matmul
    tile: Optional["TilePlan"] = None
    tile_t: Optional["TilePlan"] = None
    # bit-packed {0,1} tile part (tiles.split_bit_tiles): 1 bit/cell A
    # storage for the non-multigraph tiles — 8x less dense-side HBM
    # traffic; `tile` then holds only the multi-count (hub) tiles
    tile_bits: Optional["TilePlan"] = None
    tile_bits_t: Optional["TilePlan"] = None

    def tile_parts(self):
        return tuple(
            p for p in (self.tile_bits, self.tile)
            if p is not None and p.num_tiles
        )

    def tile_parts_t(self):
        return tuple(
            p for p in (self.tile_bits_t, self.tile_t)
            if p is not None and p.num_tiles
        )

    # ------------------------------------------------------------- building
    @classmethod
    def schedule(
        cls,
        g: CSRGraph,
        schedule: Schedule = Schedule.neighbor_grouping,
        with_transpose: bool = True,
        device_put: bool = True,
        **kw,
    ) -> "Aggregator":
        """Build plans for a graph — the analog of ``Aggregator::schedule``
        (aggregator.h:67-122) plus optional transposed-graph scheduling."""
        plan = make_plan(g, schedule, **kw)
        plan_t = None
        edge_map = None
        if with_transpose:
            gt, edge_map = g.transpose_with_map()
            plan_t = make_plan(gt, schedule, **kw)
            edge_map = edge_map.astype(np.int32)
        agg = cls(
            plan=plan,
            plan_t=plan_t,
            edge_map_t=edge_map,
            num_nodes=g.num_nodes,
            n_src=g.n_src,
            num_edges=g.num_edges,
        )
        return agg.device_put() if device_put else agg

    @classmethod
    def schedule_hybrid(
        cls,
        g: CSRGraph,
        val=None,
        tile_rows: int = 256,
        tile_cols: int = 128,
        threshold: Optional[int] = None,
        residual_block: int = 8,
        tile_dtype=None,
        with_transpose: bool = True,
        device_put: bool = True,
        pack: int = 8,
        bit_tiles: bool = False,
        **densify_kw,
    ) -> "Aggregator":
        """Hybrid MXU-densified schedule: dense adjacency tiles on the
        systolic array + NG gather plan for the sparse residue
        (schedule/tiles.py; the TPU-native replacement for the reference's
        locality schedule + reorder, SURVEY.md §7).

        bit_tiles: split integer-count tiles by content — 0/1-only tiles
        store 1 bit/cell (8x less A traffic), multigraph tiles stay int8
        (tiles.split_bit_tiles).  Requires an integer tile_dtype."""
        import numpy as _np

        if tile_dtype is not None:
            # dtype goes INTO densify: integer dtypes trigger the
            # overflow-spill path there (counts beyond the int range move
            # to the residual)
            densify_kw.setdefault("dtype", tile_dtype)
        tile, res = densify(
            g,
            val=val,
            tile_rows=tile_rows,
            tile_cols=tile_cols,
            threshold=threshold,
            **densify_kw,
        )
        tile_b = None
        if bit_tiles:
            from gnn_computing_tpu.schedule.tiles import split_bit_tiles

            assert _np.issubdtype(tile.a.dtype, np.integer), (
                "bit_tiles needs integer count tiles (tile_dtype=int8)"
            )
            tile_b, tile = split_bit_tiles(tile)
        plan = make_plan(
            res, Schedule.neighbor_grouping, block_size=residual_block
        )
        tile_t = None
        tile_b_t = None
        plan_t = None
        edge_map = None
        if with_transpose:
            if tile is not None:
                tile_t = tile.transpose().pad_runs(pack)
            if tile_b is not None:
                tile_b_t = tile_b.transpose()
                if tile_b_t.tile_rows < 256:
                    # below the Pallas bit-kernel's minimum sublane tile
                    # (ops.pallas_bcsr.supported): keep backward on the
                    # fast int8 kernel instead of the XLA scan fallback
                    tile_b_t = tile_b_t.unpack_bits()
                tile_b_t = tile_b_t.pad_runs(pack)
            gt, edge_map = res.transpose_with_map()
            plan_t = make_plan(
                gt, Schedule.neighbor_grouping, block_size=residual_block
            )
            edge_map = edge_map.astype(_np.int32)
        # pad tile-row runs to multiples of `pack` so the Pallas kernel can
        # process K tiles per grid step (amortizing per-step fixed cost)
        if tile is not None:
            tile = tile.pad_runs(pack)
        if tile_b is not None:
            tile_b = tile_b.pad_runs(pack)
        agg = cls(
            plan=plan,
            plan_t=plan_t,
            edge_map_t=edge_map,
            num_nodes=g.num_nodes,
            n_src=g.n_src,
            num_edges=g.num_edges,
            tile=tile,
            tile_t=tile_t,
            tile_bits=tile_b,
            tile_bits_t=tile_b_t,
        )
        return agg.device_put() if device_put else agg

    def device_put(self) -> "Aggregator":
        return dataclasses.replace(
            self,
            plan=self.plan.device_put(),
            plan_t=None if self.plan_t is None else self.plan_t.device_put(),
            edge_map_t=(
                None if self.edge_map_t is None else jnp.asarray(self.edge_map_t)
            ),
            tile=None if self.tile is None else self.tile.device_put(),
            tile_t=None if self.tile_t is None else self.tile_t.device_put(),
            tile_bits=(
                None if self.tile_bits is None else self.tile_bits.device_put()
            ),
            tile_bits_t=(
                None
                if self.tile_bits_t is None
                else self.tile_bits_t.device_put()
            ),
        )

    # ------------------------------------------------------------ edge vals
    def slot_values(self, edge_val: jnp.ndarray) -> jnp.ndarray:
        """Per-edge values (original CSR order) -> forward slot layout."""
        return slots_from_edge_values(self.plan, edge_val)

    def transposed_val(self, edge_val: jnp.ndarray) -> jnp.ndarray:
        """Per-edge values (original CSR order) -> transposed slot layout."""
        assert self.plan_t is not None and self.edge_map_t is not None
        return slots_from_edge_values(
            self.plan_t, jnp.take(edge_val, self.edge_map_t)
        )

    # ------------------------------------------------------------------ ops
    def run(
        self,
        h: jnp.ndarray,
        val=None,
        val_t=None,
        strategy: str = "auto",
        residual_gather_dtype=None,
        tile_h_mode: str = "auto",
    ) -> jnp.ndarray:
        """Weighted SpMM aggregation (reference Aggregator_GCN::run,
        aggr_gcn.h:411-460).  With a transposed plan available, backward
        uses fast transposed aggregation; ``val``/``val_t`` are slot-layout
        edge values (val_t required iff val given and transpose in use)."""
        tps = self.tile_parts()
        if tps:
            from gnn_computing_tpu.ops.bcsr import hybrid_spmm

            assert val is None, (
                "hybrid aggregators carry edge values inside their plans"
            )
            plan = self.plan if self.plan.num_edges else None
            plan_t = (
                self.plan_t
                if self.plan_t is not None and self.plan_t.num_edges
                else None
            )
            return hybrid_spmm(
                tps,
                self.tile_parts_t() or None,
                plan,
                plan_t,
                h,
                strategy,
                residual_gather_dtype,
                tile_h_mode,
            )
        if self.plan_t is not None:
            if val is None and self.plan_t.val is not None:
                # plan values were built from the same graph val — already
                # consistent between the two layouts.
                return spmm_bidir(self.plan, self.plan_t, h, None, None)
            if val is not None and val_t is not None:
                return spmm_bidir(self.plan, self.plan_t, h, val, val_t)
        return spmm(self.plan, h, val=val, strategy=strategy)

    def run_transpose(self, g_out: jnp.ndarray, val_t=None) -> jnp.ndarray:
        """Aggregate over the reversed graph (dH-style products)."""
        assert self.plan_t is not None
        return spmm(self.plan_t, g_out, val=val_t)

    def run_gat(
        self,
        h: jnp.ndarray,
        att: jnp.ndarray,
        relu_slope: float = gat_mod.DEFAULT_SLOPE,
        stabilize: bool = False,
        att_gather_dtype=None,
        h_gather_dtype=None,
        dot_mode: str = "exact",
    ) -> jnp.ndarray:
        """Fused GAT attention aggregation (Aggregator_GAT::run,
        aggr_gat.h:317-354)."""
        tps = self.tile_parts()
        if tps:
            from gnn_computing_tpu.ops.bcsr_gat import hybrid_gat

            return hybrid_gat(
                tps, self.plan, h, att, relu_slope=relu_slope,
                att_gather_dtype=att_gather_dtype,
                h_gather_dtype=h_gather_dtype,
                stabilize=stabilize,
                tp_t=self.tile_parts_t() or None,
                plan_t=self.plan_t,
                edge_map_t=self.edge_map_t,
                dot_mode=dot_mode,
            )
        return gat_mod.gat_aggregate(
            self.plan, h, att, relu_slope=relu_slope, stabilize=stabilize
        )

    def run_sddmm(self, a, b, output: str = "edges"):
        return sddmm_op(self.plan, a, b, output=output)
