import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS","") + " --xla_force_host_platform_device_count=1"
import jax; jax.config.update("jax_platforms","cpu")
import numpy as np, dataclasses as dc, jax.numpy as jnp
from dagnn_tpu.dag.batch import collate, PadConfig
from dagnn_tpu.data.synthetic import synthetic_ast_batch
from dagnn_tpu.nn.dagnn import dagnn_init, dagnn_forward, DAGNNConfig
from dagnn_tpu.nn.encoders import EncoderSpec
import __graft_entry__ as ge

graphs = synthetic_ast_batch(0, 48, mean_nodes=60)
cfg = dc.replace(ge._flagship_cfg(emb=24, hidden=24),
                 encoder=EncoderSpec("ast", emb_dim=24, num_nodetypes=98, num_nodeattributes=10030, max_depth=20))
params = dagnn_init(jax.random.PRNGKey(0), cfg)
outs = {}
for st in (0,1):
    pad = PadConfig.for_graphs(graphs, chunk_size=32, edge_budget=48, stagger=st)
    b = collate(graphs, pad)
    print(f"stagger={st}: rows={b.fwd.node_ids.shape[0]} (rev {b.rev.node_ids.shape[0]}) kn={pad.nodes_per_level} ke={pad.edges_per_level} kt={pad.tgrad_per_level}")
    outs[st] = np.asarray(dagnn_forward(params, cfg, jax.tree.map(jnp.asarray, b)))
print("max |out_on - out_off| =", np.abs(outs[0]-outs[1]).max())
# also grads equal
from dagnn_tpu.train.losses import tok_loss
for st in (0,1):
    pad = PadConfig.for_graphs(graphs, chunk_size=32, edge_budget=48, stagger=st)
    b = jax.tree.map(jnp.asarray, collate(graphs, pad))
    g = jax.grad(lambda p: tok_loss(dagnn_forward(p,cfg,b), b.y["y_arr"], b.graph_mask))(params)
    outs[f"g{st}"] = g
d = jax.tree.map(lambda a,b: float(jnp.abs(a-b).max()), outs["g0"], outs["g1"])
print("max grad dev:", max(jax.tree.leaves(d)))
