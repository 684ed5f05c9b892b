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
