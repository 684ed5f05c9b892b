import time, dataclasses
import jax, jax.numpy as jnp
from dagnn_tpu.dag.batch import collate, PadConfig
from dagnn_tpu.data.synthetic import synthetic_ast_batch
from dagnn_tpu.nn.dagnn import dagnn_init, dagnn_forward
from dagnn_tpu.train.losses import tok_loss
import __graft_entry__ as ge
import dataclasses as dc

graphs = synthetic_ast_batch(0, 160, mean_nodes=125)

def make(chunk, dtype, eb_mult):
    cfg = dataclasses.replace(ge._flagship_cfg(), compute_dtype=dtype)
    pad = PadConfig.for_graphs(graphs, chunk_size=chunk, edge_budget=int(chunk*eb_mult))
    r = lambda v: int(v*1.3)+16
    pad = dc.replace(pad, max_nodes=r(pad.max_nodes), max_edges=r(pad.max_edges),
                     max_graphs=len(graphs)+2, max_levels=pad.max_levels+8,
                     edges_per_level=r(pad.edges_per_level))
    batch = collate(graphs, pad)
    return cfg, jax.tree.map(jnp.asarray, batch), int(batch.n_edge)

def bench_fn(fn, *args, N=8):
    o = fn(*args); jax.block_until_ready(o)
    t0=time.perf_counter()
    for _ in range(N): o = fn(*args)
    jax.block_until_ready(o)
    return (time.perf_counter()-t0)/N

for chunk, eb in ((128,1.5),(192,1.5),(256,1.0),(256,2.0)):
    cfg,b,ne = make(chunk,"float32",eb)
    params = dagnn_init(jax.random.PRNGKey(0), cfg)
    def loss_fn(p,bb): return tok_loss(dagnn_forward(p,cfg,bb), bb.y["y_arr"], bb.graph_mask)
    fwd = jax.jit(loss_fn)
    g = jax.jit(jax.value_and_grad(loss_fn))
    tf = bench_fn(fwd, params, b)
    tg = bench_fn(g, params, b)
    L = b.fwd.node_ids.shape[0]
    print(f"chunk={chunk} eb={eb}: rows={L} fwd={tf*1e3:.1f}ms fwd+bwd={tg*1e3:.1f}ms -> {ne/tg:,.0f} e/s")
