import time, dataclasses, json
import jax, jax.numpy as jnp
from dagnn_tpu.dag.batch import collate, PadConfig
from dagnn_tpu.data.synthetic import synthetic_ast_batch
from dagnn_tpu.nn.dagnn import dagnn_init, dagnn_forward
from dagnn_tpu.train.losses import tok_loss
from dagnn_tpu.train.optim import make_optimizer
import __graft_entry__ as ge

graphs = synthetic_ast_batch(0, 160, mean_nodes=125)

def run(chunk, dtype, eb_mult=1.5):
    cfg = dataclasses.replace(ge._flagship_cfg(), compute_dtype=dtype)
    pad = PadConfig.for_graphs(graphs, chunk_size=chunk, edge_budget=int(chunk*eb_mult))
    import dataclasses as dc
    r = lambda v: int(v*1.3)+16
    pad = dc.replace(pad, max_nodes=r(pad.max_nodes), max_edges=r(pad.max_edges),
                     max_graphs=len(graphs)+2, max_levels=pad.max_levels+8,
                     edges_per_level=r(pad.edges_per_level))
    batch = collate(graphs, pad)
    n_edges = int(batch.n_edge)
    params = dagnn_init(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(lr=1e-3, clip=0.25)
    opt_state = opt.init(params)
    def loss_fn(p,b):
        return tok_loss(dagnn_forward(p,cfg,b), b.y["y_arr"], b.graph_mask)
    @jax.jit
    def step(p,s,b):
        loss, grads = jax.value_and_grad(loss_fn)(p,b)
        u, s = opt.update(grads, s, p)
        return jax.tree.map(lambda a,x: a+x, p, u), s, loss
    batch = jax.tree.map(jnp.asarray, batch)
    p,s,l = step(params,opt_state,batch); jax.block_until_ready(l)
    t0=time.perf_counter(); N=8
    for _ in range(N):
        p,s,l = step(p,s,batch)
    jax.block_until_ready(l)
    dt=(time.perf_counter()-t0)/N
    L = batch.fwd.node_ids.shape[0]
    print(f"chunk={chunk:5d} dtype={dtype:9s} eb={eb_mult}: {n_edges/dt:,.0f} edges/s  rows={L} step={dt*1e3:.1f}ms")
    return n_edges/dt

for chunk in (256, 512, 1024):
    run(chunk, "float32")
run(256, "bfloat16")
run(512, "bfloat16")
run(1024, "bfloat16")
