"""dagnn_tpu — a TPU-native DAG message-passing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of vthost/DAGNN
(ICLR 2021 "Directed Acyclic Graph Neural Networks"): level-synchronous
wavefront execution over batched DAGs, edge-wise attention aggregation
(SDDMM + segment-softmax + SpMM over level-CSR), GRU node updates,
bidirectional reverse passes, VAE coupling (D-VAE decoder), and
multi-chip/multi-host scaling via jax.sharding meshes.

Layout:
    dag/       topological core: leveling, level schedules, batching
    ops/       segment ops, fused edge-attention kernels (XLA + Pallas), GRU
    nn/        models: canonical DAGNN, encoders, readouts, GNN baselines
    vae/       D-VAE scaffolding: decoder, losses, sparse GP, BO
    data/      dataset pipelines: ENAS/NA, BN, ogbg-code2
    parallel/  mesh setup, data-parallel + edge-partitioned execution
    train/     optimizers, train loops, checkpointing, metrics, evaluators
    cli/       experiment drivers
"""

__version__ = "0.1.0"
