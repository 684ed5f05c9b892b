import time, dataclasses as dc
import jax, jax.numpy as jnp
from dagnn_tpu.dag.batch import collate, PadConfig
from dagnn_tpu.data.synthetic import synthetic_ast_batch
from dagnn_tpu.nn.dagnn import dagnn_init, dagnn_forward
from dagnn_tpu.train.losses import tok_loss
from dagnn_tpu.train.optim import make_optimizer
import __graft_entry__ as ge

graphs = synthetic_ast_batch(0, 160, mean_nodes=125)

def run(chunk, eb, st, dtype="float32"):
    cfg = dc.replace(ge._flagship_cfg(), compute_dtype=dtype)
    pad = PadConfig.for_graphs(graphs, chunk_size=chunk, edge_budget=eb, stagger=st)
    b = collate(graphs, pad)
    ne = int(b.n_edge)
    p = dagnn_init(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(lr=1e-3, clip=0.25)
    s = opt.init(p)
    def lf(pp,bb): return tok_loss(dagnn_forward(pp,cfg,bb), bb.y["y_arr"], bb.graph_mask)
    @jax.jit
    def step(pp,ss,bb):
        l, g = jax.value_and_grad(lf)(pp,bb)
        u, ss = opt.update(g, ss, pp)
        return jax.tree.map(lambda a,x: a+x, pp, u), ss, l
    b = jax.tree.map(jnp.asarray, b)
    p,s,l = step(p,s,b); jax.block_until_ready(l)
    t0=time.perf_counter(); N=8
    for _ in range(N): p,s,l = step(p,s,b)
    jax.block_until_ready(l)
    dt=(time.perf_counter()-t0)/N
    print(f"chunk={chunk} eb={eb} st={st} {dtype}: rows={pad.max_levels} ke={pad.edges_per_level} kt={pad.tgrad_per_level} step={dt*1e3:.1f}ms -> {ne/dt:,.0f} e/s", flush=True)

run(256, 384, 1)
run(256, 0, 1)
run(512, 768, 1)
run(256, 384, 1, "bfloat16")
