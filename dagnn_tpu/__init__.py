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

import os as _os

# TPU scoped-VMEM stack limit: the direction-merged backward kernel at
# dense-packed row widths needs ~17-38MB of scoped VMEM; the libtpu
# default is 16MB while v5e has 128MB physical. Must be in the env before
# libtpu initializes (first jax backend touch), hence set at import.
_lta = _os.environ.get("LIBTPU_INIT_ARGS", "")
if "scoped_vmem" not in _lta:
    _os.environ["LIBTPU_INIT_ARGS"] = (
        _lta + " --xla_tpu_scoped_vmem_limit_kib=32768").strip()
del _os, _lta


__version__ = "0.1.0"
