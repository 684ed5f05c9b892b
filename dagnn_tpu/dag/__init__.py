from dagnn_tpu.dag.topo import (
    topo_levels,
    assert_topo_order,
    longest_path_length,
)
from dagnn_tpu.dag.schedule import LevelSchedule, build_level_schedule
from dagnn_tpu.dag.batch import DAGGraph, DAGBatch, PadConfig, collate

__all__ = [
    "topo_levels",
    "assert_topo_order",
    "longest_path_length",
    "LevelSchedule",
    "build_level_schedule",
    "DAGGraph",
    "DAGBatch",
    "PadConfig",
    "collate",
]
