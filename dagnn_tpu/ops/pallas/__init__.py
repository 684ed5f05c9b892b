from dagnn_tpu.ops.pallas.segment_attn import pallas_edge_softmax_aggregate

__all__ = ["pallas_edge_softmax_aggregate"]
