"""Worker for the 2-process distributed test (see test_multiprocess.py).

Each process: 4 virtual CPU devices; global mesh (dp=2 processes) x
(ep=4 local chips). Runs one sharded-state EP training step on
deterministic data and checks the loss against the single-device
reference computed locally. Usage: _mp_worker.py <pid> <nproc> <port>.
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dagnn_tpu.parallel.mesh import init_distributed, make_hybrid_mesh  # noqa

init_distributed(coordinator_address=f"localhost:{port}",
                 num_processes=nproc, process_id=pid)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from dagnn_tpu.dag.batch import PadConfig, collate  # noqa: E402
from dagnn_tpu.nn.dagnn import DAGNNConfig, dagnn_init, dagnn_forward  # noqa
from dagnn_tpu.nn.encoders import EncoderSpec  # noqa: E402
from dagnn_tpu.parallel.edge_partition import (  # noqa: E402
    partition_schedule_sharded, ep_readout_aux, make_ep_train_step)
from dagnn_tpu.train.losses import tok_loss  # noqa: E402
from dagnn_tpu.train.optim import make_optimizer  # noqa: E402
from test_dagnn import random_dag_graph  # noqa: E402

assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 4 * nproc

n_dp, n_ep = nproc, 4
mesh = make_hybrid_mesh(dp=n_dp, ep=n_ep)

cfg = DAGNNConfig(num_vocab=7, max_seq_len=2, emb_dim=8, hidden_dim=8,
                  num_rels=2, num_layers=2, bidirectional=True,
                  agg="attn_h", out_pool="max",
                  encoder=EncoderSpec("identity", emb_dim=8))
params = dagnn_init(jax.random.PRNGKey(0), cfg)


def loss_head(logits, y, gmask):
    return tok_loss(logits, y["y_arr"], gmask)


# deterministic data: identical on every process
rng = np.random.default_rng(11)
pad = None
groups = []
for gi in range(n_dp):
    graphs = [random_dag_graph(rng, n, 8) for n in (9, 7, 12, 10)]
    for g in graphs:
        g.y = {"y_arr": rng.integers(0, 7, 2)}
    if pad is None:
        import dataclasses as dc
        pad = PadConfig.for_graphs(graphs, chunk_size=2 * n_ep)
        pad = dc.replace(pad, max_nodes=pad.max_nodes + 32,
                         max_edges=pad.max_edges + 32,
                         max_levels=pad.max_levels + 4,
                         edges_per_level=pad.edges_per_level + 16,
                         tgrad_per_level=0)
    groups.append(collate(graphs, pad))

widths = {}
scheds = []
for pass_i in range(2):
    scheds = []
    for b in groups:
        ef, stf = partition_schedule_sharded(
            b.fwd, n_ep, widths=widths if pass_i else None)
        er, str_ = partition_schedule_sharded(
            b.rev, n_ep, widths=widths if pass_i else None)
        scheds.append((ef, er, stf, str_))
        if not pass_i:
            from dagnn_tpu.parallel.edge_partition import ep_widths_of
            for eps, st in ((ef, stf), (er, str_)):
                widths.update(ep_widths_of(eps, st, widths))

auxes = [ep_readout_aux(b, (ef, er), cfg)
         for b, (ef, er, _, _) in zip(groups, scheds)]
stk = lambda xs: jax.tree.map(lambda *a: np.stack(a), *xs)
data = dict(
    x=np.stack([b.x for b in groups]),
    ea=np.stack([b.edge_attr for b in groups]),
    eps=stk([(ef, er) for ef, er, _, _ in scheds]),
    aux=stk(auxes),
    y=stk([b.y for b in groups]),
    gm=np.stack([b.graph_mask for b in groups]),
)

# replicate global inputs (identical on all processes); the shard_map's
# in_specs slice each device's shard out
rep = NamedSharding(mesh, P())
put = lambda t: jax.tree.map(lambda a: jax.device_put(jnp.asarray(a), rep), t)

opt = make_optimizer(lr=1e-3, clip=0.25)
step = make_ep_train_step(cfg, mesh, scheds[0][2:], loss_head, opt,
                          axis="ep", dp_axis="dp")
params_r = put(params)
_, _, loss = step(params_r, put(opt.init(params)), put(data["x"]),
                  put(data["ea"]), put(data["eps"]), put(data["aux"]),
                  put(data["y"]), put(data["gm"]))

ref = float(np.mean([
    float(loss_head(dagnn_forward(params, cfg, b), b.y, b.graph_mask))
    for b in groups]))
err = abs(float(loss) - ref)
assert err < 1e-4, f"loss {float(loss)} vs ref {ref}"
print(f"MP_OK {pid} {float(loss):.6f}", flush=True)
