import time, dataclasses as dc
import jax, jax.numpy as jnp
from dagnn_tpu.dag.batch import collate, PadConfig
from dagnn_tpu.data.synthetic import synthetic_ast_batch
from dagnn_tpu.nn.dagnn import dagnn_init, dagnn_forward
from dagnn_tpu.train.losses import tok_loss
import __graft_entry__ as ge

graphs = synthetic_ast_batch(0, 160, mean_nodes=125)

def make(cfg, chunk=256, eb=1.5):
    pad = PadConfig.for_graphs(graphs, chunk_size=chunk, edge_budget=int(chunk*eb))
    r = lambda v: int(v*1.3)+16
    pad = dc.replace(pad, max_nodes=r(pad.max_nodes), max_edges=r(pad.max_edges),
                     max_graphs=len(graphs)+2, max_levels=pad.max_levels+8,
                     edges_per_level=r(pad.edges_per_level))
    b = collate(graphs, pad)
    return jax.tree.map(jnp.asarray, b), int(b.n_edge)

def t(fn, *a, N=8):
    o=fn(*a); jax.block_until_ready(o)
    t0=time.perf_counter()
    for _ in range(N): o=fn(*a)
    jax.block_until_ready(o)
    return (time.perf_counter()-t0)/N*1e3

base = ge._flagship_cfg()
variants = {
  "attn_h/f32": base,
  "attn_h/bf16": dc.replace(base, compute_dtype="bfloat16"),
  "add/f32": dc.replace(base, agg="add"),
  "gated/f32": dc.replace(base, agg="gated_sum"),
  "attn_h/scatter": dc.replace(base, segment_impl="scatter"),
  "attn_h/unidir": dc.replace(base, bidirectional=False),
  "attn_h/1layer": dc.replace(base, num_layers=1),
  "attn_h/norecurr": dc.replace(base, recurr=False),
}
for name, cfg in variants.items():
    b, ne = make(cfg)
    p = dagnn_init(jax.random.PRNGKey(0), cfg)
    def lf(pp,bb): return tok_loss(dagnn_forward(pp,cfg,bb), bb.y["y_arr"], bb.graph_mask)
    tf = t(jax.jit(lf), p, b)
    tg = t(jax.jit(jax.value_and_grad(lf)), p, b)
    print(f"{name:16s}: fwd={tf:6.1f}ms  fwd+bwd={tg:6.1f}ms")
