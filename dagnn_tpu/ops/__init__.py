from dagnn_tpu.ops.segment import (
    segment_sum,
    segment_max,
    segment_softmax,
    edge_softmax_aggregate,
)
from dagnn_tpu.ops.linear import linear, linear_init, Initializer
from dagnn_tpu.ops.gru import gru_cell, gru_init

__all__ = [
    "segment_sum",
    "segment_max",
    "segment_softmax",
    "edge_softmax_aggregate",
    "linear",
    "linear_init",
    "Initializer",
    "gru_cell",
    "gru_init",
]
