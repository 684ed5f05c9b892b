"""Minimal pure-torch PyG / torch_scatter shim to execute the ACTUAL
reference model file (`/root/reference/ogbg-code/model/dagnn.py`) on the
installed CPU torch, without torch_geometric / torch_scatter / CUDA.

This exists so the model-parity gate is "matches the reference code itself"
rather than "matches a hand transcription" (which could reproduce its
author's misreading). Only the surface that file touches is implemented:

- ``MessagePassing`` with ``aggr='add'|'max'``, ``flow='source_to_target' |
  'target_to_source'``, and ``propagate`` doing signature-driven collection
  of ``*_i``/``*_j``/``index``/``ptr``/``size_i`` message arguments
  (reference conv classes: dagnn.py:232-409).
- ``torch_geometric.utils.softmax`` — per-destination segment softmax with
  the PyG max-subtract + ``+1e-16`` normalization.
- ``global_{add,mean,max}_pool`` (dagnn.py:95,118 readout).
- ``torch_geometric.nn.inits.{uniform,glorot}`` (imported; glorot used by
  ``init_param_emb`` only).
- ``torch_scatter.scatter_add`` (imported at dagnn.py:5).

Scatter-max semantics: true max over present entries, 0 for empty segments
(torch_scatter 2.x documented behavior). Only non-empty rows are ever read
by the model (every level->0 node has >=1 predecessor in its direction).
"""

import importlib.util
import inspect
import sys
import types

import torch
import torch.nn as nn

REF = "/root/reference"


# ---------------------------------------------------------------- scatter ops

def scatter_add(src, index, dim=0, out=None, dim_size=None):
    assert dim == 0
    n = dim_size if dim_size is not None else int(index.max()) + 1
    shape = (n,) + tuple(src.shape[1:])
    if out is None:
        out = src.new_zeros(shape)
    return out.index_add(0, index, src)


def _scatter_max(src, index, dim_size):
    n = dim_size
    shape = (n,) + tuple(src.shape[1:])
    out = src.new_full(shape, float("-inf"))
    idx = index.view(-1, *([1] * (src.dim() - 1))).expand_as(src)
    out = out.scatter_reduce(0, idx, src, reduce="amax", include_self=True)
    return torch.where(torch.isinf(out), torch.zeros_like(out), out)


def pyg_degree(index, num_nodes=None, dtype=None):
    n = num_nodes if num_nodes is not None else int(index.max()) + 1
    out = torch.zeros(n, dtype=dtype or torch.float32)
    out.index_add_(0, index, torch.ones(index.shape[0], dtype=out.dtype))
    return out


def scatter_mean(src, index, dim=0, dim_size=None):
    s = scatter_add(src, index, dim, dim_size=dim_size)
    cnt = scatter_add(torch.ones(src.shape[0], 1, dtype=src.dtype), index,
                      dim, dim_size=s.shape[0])
    return s / cnt.clamp(min=1)


def pyg_softmax(src, index, ptr=None, num_nodes=None):
    """torch_geometric.utils.softmax: segment softmax grouped by ``index``."""
    n = num_nodes if num_nodes is not None else int(index.max()) + 1
    src_max = _scatter_max(src.detach(), index, n)
    out = (src - src_max.index_select(0, index)).exp()
    out_sum = scatter_add(out, index, dim_size=n)
    return out / (out_sum.index_select(0, index) + 1e-16)


# ------------------------------------------------------------ MessagePassing

class MessagePassing(nn.Module):
    def __init__(self, aggr="add", flow="source_to_target"):
        super().__init__()
        assert aggr in ("add", "max"), aggr
        assert flow in ("source_to_target", "target_to_source"), flow
        self.aggr = aggr
        self.flow = flow

    def propagate(self, edge_index, size=None, **kwargs):
        if self.flow == "source_to_target":
            j_idx, i_idx = edge_index[0], edge_index[1]
        else:
            j_idx, i_idx = edge_index[1], edge_index[0]

        # node-dim size: shape[0] of any full node tensor passed in
        n = None
        for v in kwargs.values():
            if isinstance(v, torch.Tensor):
                n = v.shape[0]
                break
        assert n is not None, "propagate needs at least one node tensor"

        msg_args = []
        for name in inspect.signature(self.message).parameters:
            if name == "index":
                msg_args.append(i_idx)
            elif name == "ptr":
                msg_args.append(None)
            elif name == "size_i":
                msg_args.append(n)
            elif name.endswith("_j"):
                base = kwargs.get(name[:-2])
                msg_args.append(None if base is None else base.index_select(0, j_idx))
            elif name.endswith("_i"):
                base = kwargs.get(name[:-2])
                msg_args.append(None if base is None else base.index_select(0, i_idx))
            else:
                msg_args.append(kwargs.get(name))
        msg = self.message(*msg_args)

        if self.aggr == "add":
            out = scatter_add(msg, i_idx, dim_size=n)
        else:
            out = _scatter_max(msg, i_idx, n)
        return self.update(out)

    def message(self, x_j):  # pragma: no cover - always overridden
        return x_j

    def update(self, aggr_out):  # pragma: no cover - always overridden
        return aggr_out


# ------------------------------------------------------------------- pooling

def global_add_pool(x, batch, size=None):
    n = size if size is not None else int(batch.max()) + 1
    return scatter_add(x, batch, dim_size=n)


def global_mean_pool(x, batch, size=None):
    n = size if size is not None else int(batch.max()) + 1
    s = scatter_add(x, batch, dim_size=n)
    cnt = scatter_add(torch.ones(x.shape[0], 1, dtype=x.dtype), batch, dim_size=n)
    return s / cnt.clamp(min=1)


def global_max_pool(x, batch, size=None):
    n = size if size is not None else int(batch.max()) + 1
    return _scatter_max(x, batch, n)


# --------------------------------------------------------------------- inits

def glorot(value):
    if value is not None:
        import math
        stdv = math.sqrt(6.0 / (value.shape[-2] + value.shape[-1]))
        value.data.uniform_(-stdv, stdv)


def uniform(size, value):
    if value is not None:
        import math
        bound = 1.0 / math.sqrt(size)
        value.data.uniform_(-bound, bound)


# ----------------------------------------------------------- module assembly

def _mk(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    return m


def _install_shim_modules():
    tg = _mk("torch_geometric")
    class _Unused(nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

    tg_nn = _mk("torch_geometric.nn",
                MessagePassing=MessagePassing,
                global_add_pool=global_add_pool,
                global_mean_pool=global_mean_pool,
                global_max_pool=global_max_pool,
                GlobalAttention=_Unused, Set2Set=_Unused)
    tg_glob = _mk("torch_geometric.nn.glob",
                  global_add_pool=global_add_pool,
                  global_mean_pool=global_mean_pool,
                  global_max_pool=global_max_pool)
    tg_glob.__all__ = ["global_add_pool", "global_mean_pool", "global_max_pool"]
    tg_inits = _mk("torch_geometric.nn.inits", uniform=uniform, glorot=glorot)
    tg_utils = _mk("torch_geometric.utils", softmax=pyg_softmax,
                   degree=pyg_degree)
    tg_typing = _mk("torch_geometric.typing", OptTensor=type(None))
    tg_typing.OptTensor = torch.Tensor  # annotation only
    tg_typing.Adj = torch.Tensor       # annotation only
    tg_nn.glob = tg_glob
    tg_nn.inits = tg_inits
    tg.nn = tg_nn
    tg.utils = tg_utils
    tg.typing = tg_typing
    ts = _mk("torch_scatter", scatter_add=scatter_add,
             scatter_mean=scatter_mean)

    mods = {
        "torch_geometric": tg,
        "torch_geometric.nn": tg_nn,
        "torch_geometric.nn.glob": tg_glob,
        "torch_geometric.nn.inits": tg_inits,
        "torch_geometric.utils": tg_utils,
        "torch_geometric.typing": tg_typing,
        "torch_scatter": ts,
    }
    return mods


def load_reference_dagnn():
    """Load the ACTUAL reference model module (ogbg-code/model/dagnn.py)
    with the shim standing in for PyG/torch_scatter. Returns the module."""
    shims = _install_shim_modules()

    # synthetic `src` package so `from src.constants import *` resolves to
    # the real reference constants without executing anything else
    src_pkg = types.ModuleType("src")
    src_pkg.__path__ = []
    spec = importlib.util.spec_from_file_location(
        "src.constants", f"{REF}/src/constants.py")
    consts = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(consts)
    src_pkg.constants = consts

    saved = {}
    inject = dict(shims)
    inject["src"] = src_pkg
    inject["src.constants"] = consts
    for k, v in inject.items():
        saved[k] = sys.modules.get(k)
        sys.modules[k] = v
    try:
        mspec = importlib.util.spec_from_file_location(
            "ref_model_dagnn", f"{REF}/ogbg-code/model/dagnn.py")
        mod = importlib.util.module_from_spec(mspec)
        mspec.loader.exec_module(mod)
    finally:
        for k, old in saved.items():
            if old is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = old
    return mod


# ------------------------------------------------- D-VAE (dvae/dagnn.py) side

class FakeIGraph:
    """Pure-Python stand-in for igraph.Graph — exactly the surface the
    reference decoder loss touches (dvae/models_pyg.py:398-456 +
    dvae/dagnn.py:187-239): directed graph with per-vertex attribute
    dicts, add_vertex/add_edge, vcount, predecessors/successors."""

    def __init__(self, directed=True):
        self._vattrs = []
        self._pred = []
        self._succ = []

    def add_vertex(self, **attrs):
        self._vattrs.append(dict(attrs))
        self._pred.append([])
        self._succ.append([])

    def add_edge(self, u, v):
        self._succ[u].append(v)
        self._pred[v].append(u)

    def vcount(self):
        return len(self._vattrs)

    def predecessors(self, v):
        return list(self._pred[v])

    def successors(self, v):
        return list(self._succ[v])

    @property
    def vs(self):
        return _FakeVS(self)


class _FakeVertex:
    def __init__(self, index):
        self.index = index


class _FakeVS:
    def __init__(self, g):
        self._g = g

    def __getitem__(self, v):
        # int -> per-vertex attribute dict; str -> list of that attribute
        # across vertices (igraph vs['name'] semantics)
        if isinstance(v, str):
            return [d[v] for d in self._g._vattrs]
        return self._g._vattrs[v]

    def __setitem__(self, name, values):
        # igraph `g.vs['attr'] = list` bulk assignment
        assert isinstance(name, str) and len(values) == self._g.vcount()
        for d, val in zip(self._g._vattrs, values):
            d[name] = val

    def __delitem__(self, name):
        # igraph `del g.vs['attr']` semantics: drop from every vertex
        for d in self._g._vattrs:
            d.pop(name, None)

    def select(self, _outdegree_eq=None):
        # only the decode loose-end query is used (models_pyg.py:383)
        assert _outdegree_eq is not None
        return [_FakeVertex(i) for i in range(self._g.vcount())
                if len(self._g._succ[i]) == _outdegree_eq]


def _graph_get_adjlist(self, mode):
    # igraph.Graph.get_adjlist: 2 == igraph.IN (predecessors), 1 == OUT
    return list(self._pred if mode == 2 else self._succ)


def _graph_copy(self):
    g = FakeIGraph()
    g._vattrs = [dict(d) for d in self._vattrs]
    g._pred = [list(p) for p in self._pred]
    g._succ = [list(p) for p in self._succ]
    return g


def _graph_neighbors(self, v):
    # igraph neighbors(): union of in- and out-neighbors (with multiplicity
    # for multi-edges; the DAGs here have none)
    return list(self._pred[v]) + list(self._succ[v])


def _graph_degree(self, v):
    return len(self._pred[v]) + len(self._succ[v])


FakeIGraph.get_adjlist = _graph_get_adjlist
FakeIGraph.copy = _graph_copy
FakeIGraph.neighbors = _graph_neighbors
FakeIGraph.degree = _graph_degree
FakeIGraph.indegree = lambda self, v: len(self._pred[v])
FakeIGraph.outdegree = lambda self, v: len(self._succ[v])


def _graph_get_adjacency(self):
    n = self.vcount()
    m = [[0] * n for _ in range(n)]
    for u in range(n):
        for v in self._succ[u]:
            m[u][v] += 1
    return types.SimpleNamespace(data=m)


FakeIGraph.get_adjacency = _graph_get_adjacency


class FakeData:
    """torch_geometric.data.Data stand-in: attribute bag (base class of
    the reference Batch; the model paths read attributes and call .to)."""

    def __init__(self, **kwargs):
        for k, v in kwargs.items():
            setattr(self, k, v)

    def to(self, device):
        return self


def load_reference_dvae_dagnn():
    """Load the ACTUAL reference dvae/dagnn.py (DAGNN VAE coupling, class
    DAGNN(DVAE_PYG)) with shims for igraph / torch_sparse / PyG. Returns
    (dagnn_module, models_pyg_module).

    NOTE the reference BASE class DVAE_PYG.loss cannot execute as written:
    its _ipropagate_to stores vertex states under 'H_forward'
    (models_pyg.py:204) while _get_ivertex_state/_get_igraph_state read
    'H_forward0' (models_pyg.py:272,301) — a KeyError on any igraph. The
    DAGNN subclass is the executable path: its _ipropagate_to override
    (dvae/dagnn.py:187-239) writes the per-layer names the readers expect.
    """
    shims = _install_shim_modules()
    ig = _mk("igraph", Graph=FakeIGraph, IN=2, OUT=1)
    ts = _mk("torch_sparse", SparseTensor=type("SparseTensor", (), {}),
             cat=lambda *a, **k: None)
    tg_data = _mk("torch_geometric.data", Data=FakeData)
    shims["torch_geometric"].data = tg_data

    src_pkg = types.ModuleType("src")
    src_pkg.__path__ = []
    cspec = importlib.util.spec_from_file_location(
        "src.constants", f"{REF}/src/constants.py")
    consts = importlib.util.module_from_spec(cspec)
    cspec.loader.exec_module(consts)
    src_pkg.constants = consts

    inject = dict(shims)
    inject.update({"igraph": ig, "torch_sparse": ts,
                   "torch_geometric.data": tg_data,
                   "src": src_pkg, "src.constants": consts})
    saved = {}
    for k, v in inject.items():
        saved[k] = sys.modules.get(k)
        sys.modules[k] = v
    try:
        def _load_as(name, path):
            spec = importlib.util.spec_from_file_location(name, path)
            mod = importlib.util.module_from_spec(spec)
            sys.modules[name] = mod
            saved.setdefault(name, None)
            spec.loader.exec_module(mod)
            return mod

        mpyg = _load_as("models_pyg", f"{REF}/dvae/models_pyg.py")
        mig = _load_as("ref_dvae_models", f"{REF}/dvae/models.py")
        _load_as("batch", f"{REF}/dvae/batch.py")
        dag = _load_as("ref_dvae_dagnn", f"{REF}/dvae/dagnn.py")
        dag_bn = _load_as("ref_dvae_dagnn_bn", f"{REF}/dvae/dagnn_bn.py")
    finally:
        for k, old in saved.items():
            if old is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = old
    return dag, mpyg, dag_bn, mig


def load_reference_baseline_gnn():
    """Load model/conv.py + model/gnn.py (OGB baseline GIN/GCN +-
    virtual node) verbatim. Returns the gnn module."""
    shims = _install_shim_modules()
    model_pkg = types.ModuleType("model")
    model_pkg.__path__ = []
    saved = {}
    inject = dict(shims)
    inject["model"] = model_pkg
    for k, v in inject.items():
        saved[k] = sys.modules.get(k)
        sys.modules[k] = v
    try:
        def _load_as(name, path):
            spec = importlib.util.spec_from_file_location(name, path)
            mod = importlib.util.module_from_spec(spec)
            sys.modules[name] = mod
            saved.setdefault(name, None)
            spec.loader.exec_module(mod)
            return mod

        conv = _load_as("model.conv", f"{REF}/ogbg-code/model/conv.py")
        model_pkg.conv = conv
        gnn = _load_as("ref_baseline_gnn", f"{REF}/ogbg-code/model/gnn.py")
    finally:
        for k, old in saved.items():
            if old is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = old
    return gnn


def load_reference_gnn2():
    """Load model/gnn2.py + model/asap.py + tg/gated_graph_conv.py verbatim
    (GGNN_Simple/GGNN/GAT/DGCNN/DiffPoolGNN/UNet/SAGPoolGNN(+EA)/ASAP) with
    the PyG-1.6 layer shims from pyg_shim_layers. Returns (gnn2, asap, tg)."""
    import pyg_shim_layers as L
    shims = _install_shim_modules()
    tg_nn = shims["torch_geometric.nn"]
    for name in ("GCNConv", "GraphConv", "GatedGraphConv", "GATConv",
                 "LEConv", "TopKPooling", "SAGPooling", "ASAPooling",
                 "GraphUNet", "DenseSAGEConv", "JumpingKnowledge"):
        setattr(tg_nn, name, getattr(L, name))
    tg_nn.dense_diff_pool = L.dense_diff_pool
    tg_nn.global_sort_pool = L.global_sort_pool
    tg_conv = _mk("torch_geometric.nn.conv", MessagePassing=MessagePassing)
    tg_nn.conv = tg_conv
    shims["torch_geometric"].nn = tg_nn
    shims["torch_geometric.utils"].dropout_adj = L.dropout_adj
    shims["torch_geometric.utils"].to_dense_batch = L.to_dense_batch
    shims["torch_geometric.utils"].to_dense_adj = L.to_dense_adj

    class _SparseTensor:  # annotation-only in tg/gated_graph_conv.py
        pass

    ts_sparse = _mk("torch_sparse", SparseTensor=_SparseTensor,
                    matmul=lambda *a, **k: None)
    tg_pkg = types.ModuleType("tg")
    tg_pkg.__path__ = []
    model_pkg = types.ModuleType("model")
    model_pkg.__path__ = []

    inject = dict(shims)
    inject.update({"torch_geometric.nn.conv": tg_conv,
                   "torch_sparse": ts_sparse,
                   "tg": tg_pkg, "model": model_pkg})
    saved = {}
    for k, v in inject.items():
        saved[k] = sys.modules.get(k)
        sys.modules[k] = v
    try:
        def _load_as(name, path):
            spec = importlib.util.spec_from_file_location(name, path)
            mod = importlib.util.module_from_spec(spec)
            sys.modules[name] = mod
            saved.setdefault(name, None)
            spec.loader.exec_module(mod)
            return mod

        tgg = _load_as("tg.gated_graph_conv",
                       f"{REF}/ogbg-code/tg/gated_graph_conv.py")
        tg_pkg.gated_graph_conv = tgg
        conv = _load_as("model.conv", f"{REF}/ogbg-code/model/conv.py")
        model_pkg.conv = conv
        gnn2 = _load_as("ref_gnn2", f"{REF}/ogbg-code/model/gnn2.py")
        asap = _load_as("ref_asap", f"{REF}/ogbg-code/model/asap.py")
    finally:
        for k, old in saved.items():
            if old is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = old
    return gnn2, asap, tgg
