"""TPU-tier tests — run on the real chip with DAGNN_TPU_TESTS=1 -m tpu.

Covers what the CPU suite cannot: the COMPILED (non-interpret) Pallas
kernels, a real train step on the chip, and bf16-vs-f32 tolerance under
actual MXU arithmetic.
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu


def _require_tpu():
    if jax.default_backend() != "tpu":
        pytest.skip("no TPU backend")


def _setup(segment_impl="dense", compute_dtype="float32"):
    from dagnn_tpu.dag.batch import PadConfig, collate
    from dagnn_tpu.nn.dagnn import DAGNNConfig, dagnn_init
    from dagnn_tpu.nn.encoders import EncoderSpec
    from dagnn_tpu.data.synthetic import synthetic_ast_batch
    cfg = DAGNNConfig(
        num_vocab=52, max_seq_len=5, emb_dim=64, hidden_dim=64,
        num_rels=2, num_layers=2, bidirectional=True, agg="attn_h",
        out_wx=False, out_pool_all=False, out_pool="max",
        segment_impl=segment_impl, compute_dtype=compute_dtype,
        encoder=EncoderSpec("ast", emb_dim=64, num_nodetypes=98,
                            num_nodeattributes=1000, max_depth=20))
    # generator ranges must match the config: out-of-range labels make the
    # CE NaN on TPU (undefined out-of-bounds gather), out-of-range attrs
    # index garbage embeddings
    graphs = synthetic_ast_batch(0, 16, mean_nodes=40, vocab=52,
                                 num_attrs=1000)
    batch = collate(graphs, PadConfig.for_graphs(graphs, chunk_size=64,
                                                 edge_budget=64, stagger=1))
    params = dagnn_init(jax.random.PRNGKey(0), cfg)
    return cfg, params, jax.tree.map(jnp.asarray, batch)


def test_fused_kernel_compiled_matches_dense():
    _require_tpu()
    from dagnn_tpu.nn.dagnn import dagnn_forward
    cfg, params, batch = _setup()
    cfg_f = dataclasses.replace(cfg, segment_impl="fused")
    od = jax.jit(lambda p: dagnn_forward(p, cfg, batch))(params)
    of = jax.jit(lambda p: dagnn_forward(p, cfg_f, batch))(params)
    scale = float(jnp.max(jnp.abs(od))) + 1e-6
    # 5e-3: both paths run MXU matmuls at default precision (bf16-quantized
    # inputs even under f32 compute), with independent rounding
    assert float(jnp.max(jnp.abs(of - od))) / scale < 5e-3


def test_fused_kernel_compiled_grads_match():
    _require_tpu()
    from dagnn_tpu.nn.dagnn import dagnn_forward
    cfg, params, batch = _setup()
    cfg_f = dataclasses.replace(cfg, segment_impl="fused")

    def loss(p, c):
        return jnp.sum(dagnn_forward(p, c, batch) ** 2)

    gd = jax.jit(lambda p: jax.grad(loss)(p, cfg))(params)
    gf = jax.jit(lambda p: jax.grad(loss)(p, cfg_f))(params)

    # Some attention parameters have mathematically ZERO gradients — a
    # segment softmax is invariant to per-segment-constant score shifts, and
    # the query block (it scores the shared destination state), the
    # attention bias, and the edge-encoder bias all shift every edge of a
    # segment equally. Both paths compute only rounding noise there (dense
    # ~1e-9 via exact autodiff cancellation, kernel ~1e-2 of the score-grad
    # scale because its two P-matmuls round independently at MXU default
    # precision). Comparing noise to noise is meaningless: zero the dead
    # blocks in both trees, then compare per-group against the group scale.
    def scrub(g):
        g = jax.tree.map(lambda x: x, g)
        for d in range(len(g["aggr"])):
            for l, ap in enumerate(g["aggr"][d]):
                dq = cfg.aggregator_spec(l).query_dim
                ap["attn_lin"]["w"] = ap["attn_lin"]["w"].at[:, :dq].set(0)
                ap["attn_lin"]["b"] = jnp.zeros_like(ap["attn_lin"]["b"])
                if "edge_encoder" in ap:
                    ap["edge_encoder"]["b"] = jnp.zeros_like(
                        ap["edge_encoder"]["b"])
        return g

    gd, gf = scrub(gd), scrub(gf)

    def group_err(gd_sub, gf_sub):
        scale = max(float(jnp.max(jnp.abs(l)))
                    for l in jax.tree.leaves(gd_sub)) + 1e-6
        return max(float(jnp.max(jnp.abs(a - b))) / scale
                   for a, b in zip(jax.tree.leaves(gd_sub),
                                   jax.tree.leaves(gf_sub)))

    # Noise floor: dense-at-highest vs dense-at-default matmul precision
    # measured 3.5-4.0e-3 on these shapes (v5e) — default-precision MXU
    # quantization alone moves grads that much. Fused measured <= 9.8e-3.
    for key in gd:
        assert group_err(gd[key], gf[key]) < 2e-2, key


def test_train_step_on_chip():
    _require_tpu()
    from dagnn_tpu.nn.dagnn import dagnn_forward
    from dagnn_tpu.train.losses import tok_loss
    from dagnn_tpu.train.optim import make_optimizer
    cfg, params, batch = _setup(compute_dtype="bfloat16")
    opt = make_optimizer(lr=1e-3, clip=0.25)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        def loss_fn(p):
            return tok_loss(dagnn_forward(p, cfg, batch),
                            batch.y["y_arr"], batch.graph_mask)
        l, g = jax.value_and_grad(loss_fn)(p)
        u, s = opt.update(g, s, p)
        return jax.tree.map(lambda a, b: a + b, p, u), s, l

    l0 = None
    for i in range(5):
        params, state, loss = step(params, state)
        if l0 is None:
            l0 = float(loss)
    assert np.isfinite(float(loss))
    assert float(loss) < l0  # training decreases loss on a fixed batch


def test_bf16_matches_f32_on_chip():
    _require_tpu()
    from dagnn_tpu.nn.dagnn import dagnn_forward
    cfg, params, batch = _setup()
    c16 = dataclasses.replace(cfg, compute_dtype="bfloat16")
    o32 = jax.jit(lambda p: dagnn_forward(p, cfg, batch))(params)
    o16 = jax.jit(lambda p: dagnn_forward(p, c16, batch))(params)
    scale = float(jnp.max(jnp.abs(o32))) + 1e-6
    rel = float(jnp.max(jnp.abs(o16 - o32))) / scale
    assert rel < 0.05, rel


def test_bench_shaped_fused_backward_compiles():
    """Compile + run smoke at the BENCH shapes (chunk 256 / edge budget
    512 / emb 300 / bf16 / fused). The round-2 chunk-512 compile failure
    and the scoped-VMEM fusion OOMs were only ever found by hand — this
    pins the production configuration."""
    _require_tpu()
    import __graft_entry__ as ge
    from dagnn_tpu.dag.batch import collate
    from dagnn_tpu.data.synthetic import synthetic_ast_batch
    from dagnn_tpu.nn.dagnn import dagnn_init, dagnn_forward
    from dagnn_tpu.train.losses import tok_loss
    cfg = ge._flagship_cfg()
    graphs = synthetic_ast_batch(0, 48, mean_nodes=125)
    batch = jax.tree.map(jnp.asarray, collate(graphs, ge._pad_for(graphs)))
    params = dagnn_init(jax.random.PRNGKey(0), cfg)

    def loss(p):
        return tok_loss(dagnn_forward(p, cfg, batch),
                        batch.y["y_arr"], batch.graph_mask)

    l, g = jax.jit(lambda p: jax.value_and_grad(loss)(p))(params)
    assert np.isfinite(float(l))
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in jax.tree.leaves(g))


def test_bf16_grad_parity_bench_widths():
    """Gradients at the production width (emb/hidden 300): bf16 fused vs
    f32 dense must agree to bf16 tolerance, per parameter group."""
    _require_tpu()
    import __graft_entry__ as ge
    from dagnn_tpu.dag.batch import collate
    from dagnn_tpu.data.synthetic import synthetic_ast_batch
    from dagnn_tpu.nn.dagnn import dagnn_init, dagnn_forward
    cfg16 = ge._flagship_cfg()
    cfg32 = dataclasses.replace(cfg16, compute_dtype="float32",
                                segment_impl="dense")
    graphs = synthetic_ast_batch(3, 16, mean_nodes=60)
    batch = jax.tree.map(jnp.asarray, collate(graphs, ge._pad_for(graphs)))
    params = dagnn_init(jax.random.PRNGKey(0), cfg16)

    def loss(p, c):
        out = dagnn_forward(p, c, batch)
        return jnp.mean(out.astype(jnp.float32) ** 2)

    g32 = jax.jit(lambda p: jax.grad(loss)(p, cfg32))(params)
    g16 = jax.jit(lambda p: jax.grad(loss)(p, cfg16))(params)

    def scrub(g):
        # zero the mathematically-dead attention blocks (segment softmax
        # is invariant to per-segment-constant shifts) — both paths hold
        # only rounding noise there; see the kernel grad test above
        for d in range(len(g["aggr"])):
            for l, ap in enumerate(g["aggr"][d]):
                dq = cfg16.aggregator_spec(l).query_dim
                ap["attn_lin"]["w"] = ap["attn_lin"]["w"].at[:, :dq].set(0)
                ap["attn_lin"]["b"] = jnp.zeros_like(ap["attn_lin"]["b"])
                if "edge_encoder" in ap:
                    ap["edge_encoder"]["b"] = jnp.zeros_like(
                        ap["edge_encoder"]["b"])
        return g

    g32, g16 = scrub(g32), scrub(g16)
    for key in g32:
        s = max(float(jnp.max(jnp.abs(l)))
                for l in jax.tree.leaves(g32[key])) + 1e-8
        err = max(float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                        - b.astype(jnp.float32)))) / s
                  for a, b in zip(jax.tree.leaves(g32[key]),
                                  jax.tree.leaves(g16[key])))
        assert err < 0.08, (key, err)


def test_ep_train_step_single_device_on_chip():
    """Sharded-state EP training on the chip's one device (D=1 exercises
    the Mosaic/XLA lowering of the exchange plans, the one-hot transpose
    return, and the halo-buffer dataflow without needing a real mesh)."""
    _require_tpu()
    from dagnn_tpu.dag.batch import PadConfig, collate
    from dagnn_tpu.data.synthetic import synthetic_ast_batch
    from dagnn_tpu.nn.dagnn import dagnn_init, dagnn_forward
    from dagnn_tpu.parallel.edge_partition import (
        partition_schedule_sharded, ep_readout_aux, make_ep_train_step)
    from dagnn_tpu.parallel.mesh import make_mesh
    from dagnn_tpu.train.losses import tok_loss
    from dagnn_tpu.train.optim import make_optimizer
    cfg, params, _ = _setup(compute_dtype="bfloat16")
    graphs = synthetic_ast_batch(1, 8, mean_nodes=24, vocab=52,
                                 num_attrs=1000)
    pad = PadConfig.for_graphs(graphs, chunk_size=16)
    batch = collate(graphs, pad)
    eps_f, st_f = partition_schedule_sharded(batch.fwd, 1)
    eps_r, st_r = partition_schedule_sharded(batch.rev, 1)
    aux = ep_readout_aux(batch, (eps_f, eps_r), cfg)
    mesh = make_mesh(1, ("ep",))

    def loss_head(logits, y, gmask):
        return tok_loss(logits, y["y_arr"], gmask)

    opt = make_optimizer(lr=1e-3, clip=0.25)
    step = make_ep_train_step(cfg, mesh, (st_f, st_r), loss_head, opt)
    _, _, loss = step(params, opt.init(params), jnp.asarray(batch.x),
                      jnp.asarray(batch.edge_attr),
                      jax.tree.map(jnp.asarray, (eps_f, eps_r)),
                      jax.tree.map(jnp.asarray, aux),
                      jax.tree.map(jnp.asarray, batch.y),
                      jnp.asarray(batch.graph_mask))
    ref = float(loss_head(dagnn_forward(params, cfg, batch), batch.y,
                          batch.graph_mask))
    assert abs(float(loss) - ref) / (abs(ref) + 1e-6) < 0.02, (float(loss), ref)


def test_gather_readout_matches_segment_pool_on_chip():
    """out_slots gather readout vs segment pooling under compiled TPU
    lowering (the gather path is the production readout)."""
    _require_tpu()
    from dagnn_tpu.nn.dagnn import dagnn_forward
    cfg, params, batch = _setup(segment_impl="fused",
                                compute_dtype="bfloat16")
    out_g = jax.jit(lambda p: dagnn_forward(p, cfg, batch))(params)
    stripped = batch._replace(out_slots_fwd=None, out_slots_mask_fwd=None,
                              out_slots_rev=None, out_slots_mask_rev=None)
    out_s = jax.jit(lambda p: dagnn_forward(p, cfg, stripped))(params)
    scale = float(jnp.max(jnp.abs(out_s))) + 1e-6
    assert float(jnp.max(jnp.abs(out_g - out_s))) / scale < 5e-3
