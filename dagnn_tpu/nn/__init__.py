from dagnn_tpu.nn.aggregators import AggregatorSpec, aggregator_init, aggregate_level
from dagnn_tpu.nn.encoders import EncoderSpec, encoder_init, encode
from dagnn_tpu.nn.readout import pool_nodes
from dagnn_tpu.nn.dagnn import DAGNNConfig, dagnn_init, dagnn_forward

__all__ = [
    "AggregatorSpec",
    "aggregator_init",
    "aggregate_level",
    "EncoderSpec",
    "encoder_init",
    "encode",
    "pool_nodes",
    "DAGNNConfig",
    "dagnn_init",
    "dagnn_forward",
]
