"""Pure-torch implementations of the torch_geometric 1.6.x layer surface
that `ogbg-code/model/gnn2.py`, `model/asap.py` and `tg/gated_graph_conv.py`
import — so those reference files execute VERBATIM as golden oracles (same
role as tests/pyg_shim.py for the DAGNN model file).

The reference pins torch 1.5 and installs unpinned torch-geometric
(reference setup.sh:5-14), i.e. the PyG 1.6.x line (late 2020).  Each class
below follows that version's documented math (paper equation + PyG 1.6.3
module semantics), implemented with plain torch ops:

- GCNConv: Kipf & Welling sym-normalized conv with added self-loops
  (fill 2 when improved=True — GraphUNet uses improved).
- GraphConv: Morris et al., W1 x_i + W2 agg_j(w_ij x_j), aggr add|mean.
- GatedGraphConv: Li et al. GGNN, per-timestep weight + shared GRUCell,
  input padded with zeros up to out_channels.
- GATConv: Velickovic et al., shared linear + separate att_l/att_r vectors,
  LeakyReLU(0.2), per-destination softmax WITH self-loops added.
- LEConv: lin1(x)_i - lin2(x)_j messages (edge-weighted) + lin3(x).
- TopKPooling / SAGPooling: Gao & Ji / Lee et al. — top-ratio selection per
  graph, tanh-gated features, edge filtering with node relabeling.
  SAGPooling's default scorer GNN is GraphConv (PyG 1.6).
- ASAPooling (+LEConv fitness): Ranjan et al. — 1-hop master-query
  attention clusters, LEConv fitness, top-ratio selection, and the
  S^T A S graph reconnection with diagonal removal.
- GraphUNet: Gao & Ji — depth x (augment A -> A^2, TopKPool, GCN), sum
  skip connections on unpool.
- DenseSAGEConv / dense_diff_pool: mean-aggregated dense SAGE; Ying et al.
  soft assignment pooling (losses returned but unused by the reference
  forward).
- global_sort_pool: Zhang et al. DGCNN sort pooling (sort by last channel,
  top-k, zero pad).
- to_dense_batch / to_dense_adj, JumpingKnowledge('cat'), dropout_adj
  (imported by gnn2.py, only used in commented-out code).

Everything is float64-capable plain torch; no CUDA, no torch_scatter.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

from pyg_shim import (MessagePassing, scatter_add, _scatter_max, pyg_softmax,
                      uniform, glorot)


# ------------------------------------------------------------------ helpers

def add_remaining_self_loops(edge_index, edge_weight=None, fill_value=1.0,
                             num_nodes=None):
    n = num_nodes if num_nodes is not None else int(edge_index.max()) + 1
    mask = edge_index[0] != edge_index[1]
    loop = torch.arange(n, dtype=edge_index.dtype)
    ei = torch.cat([edge_index[:, mask], torch.stack([loop, loop])], dim=1)
    if edge_weight is None:
        return ei, None
    ew = torch.cat([edge_weight[mask],
                    torch.full((n,), fill_value, dtype=edge_weight.dtype)])
    return ei, ew


def _gcn_norm(edge_index, edge_weight, num_nodes, improved=False):
    fill = 2.0 if improved else 1.0
    if edge_weight is None:
        edge_weight = torch.ones(edge_index.shape[1])
    ei, ew = add_remaining_self_loops(edge_index, edge_weight, fill,
                                      num_nodes)
    row, col = ei[0], ei[1]
    deg = scatter_add(ew, col, dim_size=num_nodes)
    dis = deg.pow(-0.5)
    dis[torch.isinf(dis)] = 0
    return ei, dis[row] * ew * dis[col]


class GCNConv(nn.Module):
    def __init__(self, in_channels, out_channels, improved=False, bias=True):
        super().__init__()
        self.improved = improved
        self.weight = nn.Parameter(torch.empty(in_channels, out_channels))
        self.bias = nn.Parameter(torch.zeros(out_channels)) if bias else None
        glorot(self.weight)

    def forward(self, x, edge_index, edge_weight=None):
        n = x.shape[0]
        x = x @ self.weight
        ei, norm = _gcn_norm(edge_index, edge_weight, n, self.improved)
        out = scatter_add(norm.unsqueeze(-1) * x.index_select(0, ei[0]),
                          ei[1], dim_size=n)
        if self.bias is not None:
            out = out + self.bias
        return out


class GraphConv(nn.Module):
    """W1 x_i + W2 agg_{j->i}(w_ij x_j); aggr 'add' (default) or 'mean'."""

    def __init__(self, in_channels, out_channels, aggr="add", bias=True):
        super().__init__()
        self.aggr = aggr
        self.lin_rel = nn.Linear(in_channels, out_channels, bias=bias)
        self.lin_root = nn.Linear(in_channels, out_channels, bias=False)

    def reset_parameters(self):
        self.lin_rel.reset_parameters()
        self.lin_root.reset_parameters()

    def forward(self, x, edge_index, edge_weight=None):
        n = x.shape[0]
        src, dst = edge_index[0], edge_index[1]
        msg = x.index_select(0, src)
        if edge_weight is not None:
            msg = msg * edge_weight.view(-1, 1)
        out = scatter_add(msg, dst, dim_size=n)
        if self.aggr == "mean":
            # scatter-mean divides by the EDGE COUNT (messages are already
            # edge-weighted), not by the weight sum
            cnt = scatter_add(torch.ones(src.shape[0]), dst,
                              dim_size=n).clamp(min=1)
            out = out / cnt.unsqueeze(-1)
        return self.lin_rel(out) + self.lin_root(x)


class GatedGraphConv(nn.Module):
    """PyG GatedGraphConv: h0 = x || 0; per step m = A (x W_t); x = GRU(m,x)."""

    def __init__(self, out_channels, num_layers, aggr="add", bias=True):
        super().__init__()
        assert aggr == "add"
        self.out_channels = out_channels
        self.num_layers = num_layers
        self.weight = nn.Parameter(
            torch.empty(num_layers, out_channels, out_channels))
        self.rnn = nn.GRUCell(out_channels, out_channels, bias=bias)
        uniform(out_channels, self.weight)

    def forward(self, x, edge_index):
        n, c = x.shape
        if c < self.out_channels:
            x = torch.cat([x, x.new_zeros(n, self.out_channels - c)], dim=1)
        src, dst = edge_index[0], edge_index[1]
        for i in range(self.num_layers):
            m = x @ self.weight[i]
            m = scatter_add(m.index_select(0, src), dst, dim_size=n)
            x = self.rnn(m, x)
        return x


class GATConv(nn.Module):
    """PyG 1.6 GATConv: shared lin, att_l/att_r, self-loops added, softmax
    per destination, concat heads (+ bias of heads*out)."""

    def __init__(self, in_channels, out_channels, heads=1, concat=True,
                 negative_slope=0.2, add_self_loops=True, bias=True):
        super().__init__()
        self.heads, self.out_channels = heads, out_channels
        self.concat = concat
        self.negative_slope = negative_slope
        self.add_self_loops = add_self_loops
        self.lin = nn.Linear(in_channels, heads * out_channels, bias=False)
        self.att_l = nn.Parameter(torch.empty(1, heads, out_channels))
        self.att_r = nn.Parameter(torch.empty(1, heads, out_channels))
        glorot(self.lin.weight)
        glorot(self.att_l)
        glorot(self.att_r)
        out_dim = heads * out_channels if concat else out_channels
        self.bias = nn.Parameter(torch.zeros(out_dim)) if bias else None

    def forward(self, x, edge_index):
        n = x.shape[0]
        H, C = self.heads, self.out_channels
        xw = self.lin(x).view(n, H, C)
        alpha_l = (xw * self.att_l).sum(-1)          # [N, H] (source term)
        alpha_r = (xw * self.att_r).sum(-1)          # [N, H] (target term)
        ei = edge_index
        if self.add_self_loops:
            ei, _ = add_remaining_self_loops(ei, None, 1.0, n)
        src, dst = ei[0], ei[1]
        alpha = (alpha_l.index_select(0, src)
                 + alpha_r.index_select(0, dst))
        alpha = F.leaky_relu(alpha, self.negative_slope)
        alpha = pyg_softmax(alpha, dst, num_nodes=n)  # [E, H]
        out = xw.index_select(0, src) * alpha.unsqueeze(-1)
        out = scatter_add(out.reshape(-1, H * C), dst, dim_size=n)
        if not self.concat:
            out = out.view(n, H, C).mean(1)
        if self.bias is not None:
            out = out + self.bias
        return out


class LEConv(nn.Module):
    """x_i' = lin3(x_i) + sum_j w_ij (lin1(x)_i - lin2(x)_j)."""

    def __init__(self, in_channels, out_channels, bias=True):
        super().__init__()
        self.lin1 = nn.Linear(in_channels, out_channels, bias=bias)
        self.lin2 = nn.Linear(in_channels, out_channels, bias=False)
        self.lin3 = nn.Linear(in_channels, out_channels, bias=bias)

    def forward(self, x, edge_index, edge_weight=None):
        n = x.shape[0]
        a, b = self.lin1(x), self.lin2(x)
        src, dst = edge_index[0], edge_index[1]
        msg = a.index_select(0, dst) - b.index_select(0, src)
        if edge_weight is not None:
            msg = msg * edge_weight.view(-1, 1)
        return scatter_add(msg, dst, dim_size=n) + self.lin3(x)


# ------------------------------------------------------------- topk pooling

def topk(score, ratio, batch):
    """Per-graph top-ceil(ratio*n) node indices (PyG topk), in descending
    score order within each graph."""
    num_graphs = int(batch.max()) + 1
    perms = []
    for g in range(num_graphs):
        idx = (batch == g).nonzero(as_tuple=True)[0]
        k = int(math.ceil(ratio * idx.numel()))
        sel = score[idx].argsort(descending=True)[:k]
        perms.append(idx[sel])
    return torch.cat(perms)


def filter_adj(edge_index, edge_attr, perm, num_nodes):
    mask = torch.full((num_nodes,), -1, dtype=torch.long)
    mask[perm] = torch.arange(perm.numel())
    row, col = mask[edge_index[0]], mask[edge_index[1]]
    keep = (row >= 0) & (col >= 0)
    ei = torch.stack([row[keep], col[keep]])
    return ei, (None if edge_attr is None else edge_attr[keep])


class TopKPooling(nn.Module):
    def __init__(self, in_channels, ratio=0.5, multiplier=1.0,
                 nonlinearity=torch.tanh):
        super().__init__()
        self.ratio = ratio
        self.multiplier = multiplier
        self.nonlinearity = nonlinearity
        self.weight = nn.Parameter(torch.empty(1, in_channels))
        uniform(in_channels, self.weight)

    def forward(self, x, edge_index, edge_attr=None, batch=None):
        n = x.shape[0]
        if batch is None:
            batch = x.new_zeros(n, dtype=torch.long)
        score = (x * self.weight).sum(dim=-1)
        score = self.nonlinearity(score / self.weight.norm(p=2, dim=-1))
        perm = topk(score, self.ratio, batch)
        x = x[perm] * score[perm].unsqueeze(-1)
        x = self.multiplier * x
        ei, ea = filter_adj(edge_index, edge_attr, perm, n)
        return x, ei, ea, batch[perm], perm, score[perm]


class SAGPooling(nn.Module):
    """Self-attention pooling: score = GNN(x, A) (GraphConv in PyG 1.6)."""

    def __init__(self, in_channels, ratio=0.5, GNN=GraphConv,
                 multiplier=1.0, nonlinearity=torch.tanh, **kwargs):
        super().__init__()
        self.ratio = ratio
        self.gnn = GNN(in_channels, 1, **kwargs)
        self.multiplier = multiplier
        self.nonlinearity = nonlinearity

    def forward(self, x, edge_index, edge_attr=None, batch=None, attn=None):
        n = x.shape[0]
        if batch is None:
            batch = x.new_zeros(n, dtype=torch.long)
        attn = x if attn is None else attn
        score = self.gnn(attn, edge_index).view(-1)
        score = self.nonlinearity(score)
        perm = topk(score, self.ratio, batch)
        x = x[perm] * score[perm].unsqueeze(-1)
        x = self.multiplier * x
        ei, ea = filter_adj(edge_index, edge_attr, perm, n)
        return x, ei, ea, batch[perm], perm, score[perm]


class ASAPooling(nn.Module):
    """Adaptive Structure Aware Pooling (Ranjan et al. 2020; PyG 1.6.3
    torch_geometric.nn.pool.ASAPooling with GNN=None):

      A' <- A + I; master query x_q_i = lin(max_{j in N(i) U i} x_j);
      attention alpha_ij = softmax_i(LeakyReLU(att([x_q_i, x_j])));
      cluster rep x_i = sum_j alpha_ij x_j; fitness = sigmoid(LEConv(x, A'));
      keep top-ratio by fitness, scale by fitness;
      reconnect A_pooled = (S^T A' S) with diagonal removed, where
      S[j, i] = alpha_ij restricted to kept clusters i.
    """

    def __init__(self, in_channels, ratio=0.5, dropout=0.0,
                 negative_slope=0.2, add_self_loops=False):
        super().__init__()
        self.ratio = ratio
        self.dropout = dropout
        self.negative_slope = negative_slope
        self.self_loops = add_self_loops
        self.lin = nn.Linear(in_channels, in_channels)
        self.att = nn.Linear(2 * in_channels, 1)
        self.gnn_score = LEConv(in_channels, 1)

    def reset_parameters(self):
        pass

    def forward(self, x, edge_index, edge_weight=None, batch=None):
        n = x.shape[0]
        if batch is None:
            batch = x.new_zeros(n, dtype=torch.long)
        edge_index, edge_weight = add_remaining_self_loops(
            edge_index, edge_weight, 1.0, n)
        if edge_weight is None:
            edge_weight = torch.ones(edge_index.shape[1])
        src, dst = edge_index[0], edge_index[1]

        x_pool_j = x.index_select(0, src)
        x_q = _scatter_max(x_pool_j, dst, n)
        x_q = self.lin(x_q).index_select(0, dst)
        score = self.att(torch.cat([x_q, x_pool_j], dim=-1)).view(-1)
        score = F.leaky_relu(score, self.negative_slope)
        score = pyg_softmax(score, dst, num_nodes=n)
        score = F.dropout(score, p=self.dropout, training=self.training)

        v_j = x.index_select(0, src) * score.view(-1, 1)
        x = scatter_add(v_j, dst, dim_size=n)

        fitness = torch.sigmoid(
            self.gnn_score(x, edge_index).view(-1))
        perm = topk(fitness, self.ratio, batch)
        x = x[perm] * fitness[perm].view(-1, 1)
        batch = batch[perm]

        # graph reconnection: A_pool = S^T A S (dense — oracle-side only)
        A = torch.zeros(n, n)
        A[src, dst] = edge_weight
        S = torch.zeros(n, n)
        S[src, dst] = score
        S = S[:, perm]                        # [N, n_kept]
        A = S.t() @ A @ S
        if self.self_loops:
            A.fill_diagonal_(1.0)
        else:
            A.fill_diagonal_(0.0)
        row, col = A.nonzero(as_tuple=True)
        edge_index = torch.stack([row, col])
        edge_weight = A[row, col]
        return x, edge_index, edge_weight, batch, perm


class GraphUNet(nn.Module):
    """Gao & Ji Graph U-Net (PyG 1.6.3): GCN(improved) encoder/decoder with
    TopK pools, A -> (A+I)^2 augmentation per depth, sum skip connections."""

    def __init__(self, in_channels, hidden_channels, out_channels, depth,
                 pool_ratios=0.5, sum_res=True, act=F.relu):
        super().__init__()
        if not isinstance(pool_ratios, (list, tuple)):
            pool_ratios = [pool_ratios] * depth
        self.depth = depth
        self.act = act
        self.sum_res = sum_res
        self.down_convs = nn.ModuleList(
            [GCNConv(in_channels, hidden_channels, improved=True)]
            + [GCNConv(hidden_channels, hidden_channels, improved=True)
               for _ in range(depth)])
        self.pools = nn.ModuleList(
            [TopKPooling(hidden_channels, pool_ratios[i])
             for i in range(depth)])
        in_up = hidden_channels if sum_res else 2 * hidden_channels
        self.up_convs = nn.ModuleList(
            [GCNConv(in_up, hidden_channels, improved=True)
             for _ in range(depth - 1)]
            + [GCNConv(in_up, out_channels, improved=True)])

    def augment_adj(self, edge_index, edge_weight, num_nodes):
        ei, ew = add_remaining_self_loops(edge_index, edge_weight, 1.0,
                                          num_nodes)
        A = torch.zeros(num_nodes, num_nodes)
        A[ei[0], ei[1]] = ew
        A2 = A @ A
        A2.fill_diagonal_(0.0)
        row, col = A2.nonzero(as_tuple=True)
        return torch.stack([row, col]), A2[row, col]

    def forward(self, x, edge_index, batch=None):
        n = x.shape[0]
        if batch is None:
            batch = x.new_zeros(n, dtype=torch.long)
        edge_weight = x.new_ones(edge_index.shape[1])
        x = self.act(self.down_convs[0](x, edge_index, edge_weight))
        xs, eis, ews, perms = [x], [edge_index], [edge_weight], []
        for i in range(1, self.depth + 1):
            edge_index, edge_weight = self.augment_adj(
                edge_index, edge_weight, x.shape[0])
            x, edge_index, edge_weight, batch, perm, _ = self.pools[i - 1](
                x, edge_index, edge_weight, batch)
            x = self.act(self.down_convs[i](x, edge_index, edge_weight))
            if i < self.depth:
                xs += [x]
                eis += [edge_index]
                ews += [edge_weight]
            perms += [perm]
        for i in range(self.depth):
            j = self.depth - 1 - i
            res, edge_index, edge_weight, perm = xs[j], eis[j], ews[j], perms[j]
            up = torch.zeros_like(res)
            up[perm] = x
            x = res + up if self.sum_res else torch.cat((res, up), dim=-1)
            x = self.up_convs[i](x, edge_index, edge_weight)
            if i < self.depth - 1:
                x = self.act(x)
        return x


# --------------------------------------------------------------- dense side

def to_dense_batch(x, batch=None, fill_value=0.0):
    if batch is None:
        return x.unsqueeze(0), torch.ones(1, x.shape[0], dtype=torch.bool)
    G = int(batch.max()) + 1
    counts = torch.bincount(batch, minlength=G)
    nmax = int(counts.max())
    out = x.new_full((G, nmax) + x.shape[1:], fill_value)
    mask = torch.zeros(G, nmax, dtype=torch.bool)
    pos = torch.arange(x.shape[0]) - torch.cumsum(
        torch.cat([torch.zeros(1, dtype=torch.long), counts[:-1]]), 0)[batch]
    out[batch, pos] = x
    mask[batch, pos] = True
    return out, mask


def to_dense_adj(edge_index, batch=None, edge_attr=None):
    n = int(edge_index.max()) + 1 if batch is None else batch.shape[0]
    if batch is None:
        batch = torch.zeros(n, dtype=torch.long)
    G = int(batch.max()) + 1
    counts = torch.bincount(batch, minlength=G)
    nmax = int(counts.max())
    starts = torch.cumsum(
        torch.cat([torch.zeros(1, dtype=torch.long), counts[:-1]]), 0)
    pos = torch.arange(batch.shape[0]) - starts[batch]
    adj = torch.zeros(G, nmax, nmax)
    s, d = edge_index[0], edge_index[1]
    val = torch.ones(s.shape[0]) if edge_attr is None else edge_attr
    adj.index_put_((batch[s], pos[s], pos[d]), val, accumulate=True)
    return adj


class DenseSAGEConv(nn.Module):
    def __init__(self, in_channels, out_channels, normalize=False, bias=True):
        super().__init__()
        self.normalize = normalize
        self.lin_rel = nn.Linear(in_channels, out_channels, bias=False)
        self.lin_root = nn.Linear(in_channels, out_channels, bias=bias)

    def forward(self, x, adj, mask=None):
        x = x.unsqueeze(0) if x.dim() == 2 else x
        adj = adj.unsqueeze(0) if adj.dim() == 2 else adj
        out = torch.matmul(adj, x)
        out = out / adj.sum(dim=-1, keepdim=True).clamp(min=1)
        out = self.lin_rel(out) + self.lin_root(x)
        if self.normalize:
            out = F.normalize(out, p=2, dim=-1)
        if mask is not None:
            out = out * mask.view(adj.shape[0], adj.shape[1], 1).to(x.dtype)
        return out


def dense_diff_pool(x, adj, s, mask=None):
    x = x.unsqueeze(0) if x.dim() == 2 else x
    adj = adj.unsqueeze(0) if adj.dim() == 2 else adj
    s = s.unsqueeze(0) if s.dim() == 2 else s
    s = torch.softmax(s, dim=-1)
    if mask is not None:
        mask = mask.view(x.shape[0], x.shape[1], 1).to(x.dtype)
        x, s = x * mask, s * mask
    out = torch.matmul(s.transpose(1, 2), x)
    out_adj = torch.matmul(torch.matmul(s.transpose(1, 2), adj), s)
    link_loss = torch.norm(adj - torch.matmul(s, s.transpose(1, 2)), p=2)
    link_loss = link_loss / adj.numel()
    ent_loss = (-s * torch.log(s + 1e-15)).sum(dim=-1).mean()
    return out, out_adj, link_loss, ent_loss


# ---------------------------------------------------------------- misc glue

def global_sort_pool(x, batch, k):
    fill = float(x.min().item()) - 1.0
    bx, _ = to_dense_batch(x, batch, fill_value=fill)
    G, nmax, D = bx.shape
    _, perm = bx[:, :, -1].sort(dim=-1, descending=True)
    ar = torch.arange(G).view(-1, 1)
    bx = bx[ar, perm]
    if nmax >= k:
        bx = bx[:, :k]
    else:
        bx = torch.cat([bx, bx.new_full((G, k - nmax, D), fill)], dim=1)
    bx[bx == fill] = 0.0
    return bx.view(G, k * D)


class JumpingKnowledge(nn.Module):
    def __init__(self, mode="cat"):
        super().__init__()
        assert mode == "cat"

    def forward(self, xs):
        return torch.cat(xs, dim=-1)


def dropout_adj(edge_index, edge_attr=None, p=0.5, force_undirected=False,
                num_nodes=None, training=True):  # imported, not executed
    return edge_index, edge_attr
