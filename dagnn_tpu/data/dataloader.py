"""Batch loader: bucketed collation with background prefetch.

Replaces the reference's torch DataLoader + device-balanced Collater
(reference: ogbg-code/tg/dataloader.py:13-57, worker processes at
main_pyg.py:148): batches are collated on the host into one static
PadConfig per epoch (exact max over the epoch's batches, rounded up so
bucket shapes stabilize across epochs -> no per-batch recompiles), with a
thread prefetching the next batch while the accelerator steps. For
multi-chip DP the loader emits stacked per-shard batches using the same
node-balanced split policy as the reference Collater.
"""

from __future__ import annotations

import dataclasses
import threading
import queue
from typing import Iterator, List, Optional, Sequence

import numpy as np

from dagnn_tpu.dag.batch import DAGBatch, DAGGraph, PadConfig, collate
from dagnn_tpu.parallel.dp import split_by_nodes, stack_batches


def _round_cfg(cfg: PadConfig, mult: int = 64) -> PadConfig:
    r = lambda v: ((v + mult - 1) // mult) * mult
    return dataclasses.replace(
        cfg,
        max_nodes=r(cfg.max_nodes),
        max_edges=r(cfg.max_edges),
        max_levels=((cfg.max_levels + 7) // 8) * 8,
        edges_per_level=((cfg.edges_per_level + 31) // 32) * 32,
        tgrad_per_level=((cfg.tgrad_per_level + 31) // 32) * 32,
    )


class DAGLoader:
    """Iterate DAGBatches over a dataset of DAGGraphs."""

    def __init__(
        self,
        graphs: Sequence[DAGGraph],
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        chunk_size: Optional[int] = 256,
        n_shards: int = 1,
        drop_last: bool = False,
        prefetch: int = 2,
        schedules: bool = True,
        edge_budget: Optional[int] = None,
        stagger: int = 2,
    ):
        self.graphs = list(graphs)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.chunk_size = chunk_size
        # row split policy (see dag/schedule.py): 1.5x the node chunk is the
        # empirical sweet spot on the TOK workload (362k vs 270k edges/s at
        # chunk 256) — narrower budgets trade too much scan length
        if edge_budget is None:
            edge_budget = (chunk_size * 3 // 2) if (chunk_size and schedules) else 0
        self.edge_budget = edge_budget
        # row layout: 2 = critical-path packing (schedule.pack_rows, the
        # production default — depth-floor row counts at ~0.95 fill),
        # 1 = per-graph stagger, 0 = reference-aligned levels
        self.stagger = stagger if (chunk_size and schedules) else 0
        self.n_shards = n_shards
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.schedules = schedules
        self._pad: Optional[PadConfig] = None

    def _epoch_batches(self) -> List[List[DAGGraph]]:
        idx = np.arange(len(self.graphs))
        if self.shuffle:
            self.rng.shuffle(idx)
        out = []
        for i in range(0, len(idx), self.batch_size):
            sel = idx[i: i + self.batch_size]
            if self.drop_last and len(sel) < self.batch_size:
                continue
            out.append([self.graphs[j] for j in sel])
        return out

    def _ensure_pad(self, batches: List[List[DAGGraph]]) -> PadConfig:
        """One bucket for the epoch: exact max over batches (per shard),
        rounded so shapes stabilize across epochs."""
        worst = None
        for b in batches:
            shards = split_by_nodes(b, self.n_shards) if self.n_shards > 1 else [b]
            for s in shards:
                if not s:
                    continue
                if self.schedules:
                    c = PadConfig.for_graphs(s, chunk_size=self.chunk_size,
                                             edge_budget=self.edge_budget,
                                             stagger=self.stagger)
                else:
                    # cyclic baseline graphs: counts only, no leveling
                    c = PadConfig(
                        max_nodes=sum(g.num_nodes for g in s),
                        max_edges=max(1, sum(g.num_edges for g in s)),
                        max_graphs=len(s), max_levels=1,
                        nodes_per_level=1, edges_per_level=1,
                    )
                if worst is None:
                    worst = c
                else:
                    worst = PadConfig(
                        max_nodes=max(worst.max_nodes, c.max_nodes),
                        max_edges=max(worst.max_edges, c.max_edges),
                        max_graphs=max(worst.max_graphs, c.max_graphs),
                        max_levels=max(worst.max_levels, c.max_levels),
                        nodes_per_level=max(worst.nodes_per_level, c.nodes_per_level),
                        edges_per_level=max(worst.edges_per_level, c.edges_per_level),
                        tgrad_per_level=max(worst.tgrad_per_level, c.tgrad_per_level),
                        edge_budget=self.edge_budget,
                        stagger=self.stagger,
                    )
        worst = _round_cfg(worst)
        if self._pad is not None:
            # keep the old bucket if it still fits (stability across epochs)
            p = self._pad
            if (p.max_nodes >= worst.max_nodes and p.max_edges >= worst.max_edges
                    and p.max_graphs >= worst.max_graphs
                    and p.max_levels >= worst.max_levels
                    and p.nodes_per_level >= worst.nodes_per_level
                    and p.edges_per_level >= worst.edges_per_level
                    and p.tgrad_per_level >= worst.tgrad_per_level
                    and p.edge_budget == worst.edge_budget):
                return p
            worst = PadConfig(*[max(a, b) for a, b in
                                zip(dataclasses.astuple(p), dataclasses.astuple(worst))])
        self._pad = worst
        return worst

    def _collate(self, graphs: List[DAGGraph], pad: PadConfig) -> DAGBatch:
        if self.n_shards > 1:
            shards = split_by_nodes(graphs, self.n_shards)
            return stack_batches([collate(s, pad, self.schedules) for s in shards])
        return collate(graphs, pad, self.schedules)

    def __iter__(self) -> Iterator[DAGBatch]:
        batches = self._epoch_batches()
        pad = self._ensure_pad(batches)
        if self.prefetch <= 0:
            for b in batches:
                yield self._collate(b, pad)
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            try:
                for b in batches:
                    q.put(self._collate(b, pad))
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
        t.join()

    def __len__(self):
        n = len(self.graphs)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)
