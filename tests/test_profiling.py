"""utils/profiling: trace summarization over a synthetic chrome trace
(the capture side needs a real device profiler; summarize_trace is pure)."""

import gzip
import json

from dagnn_tpu.utils.profiling import summarize_trace


def test_summarize_trace(tmp_path):
    events = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 9, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        {"ph": "X", "pid": 3, "name": "fusion.1", "dur": 10.0,
         "args": {"hlo_category": "loop fusion", "long_name": "%fusion.1"}},
        {"ph": "X", "pid": 3, "name": "fusion.1", "dur": 14.0, "args": {}},
        {"ph": "X", "pid": 3, "name": "copy.2", "dur": 5.0, "args": {}},
        # host events must be excluded
        {"ph": "X", "pid": 9, "name": "python", "dur": 999.0, "args": {}},
    ]
    path = tmp_path / "x.trace.json.gz"
    with gzip.open(path, "wt") as f:
        json.dump({"traceEvents": events}, f)
    rows = summarize_trace(str(path), top=10, iters=2)
    assert rows[0]["name"] == "fusion.1"
    assert rows[0]["total_us"] == 12.0      # (10+14)/iters
    assert rows[0]["count"] == 1            # 2 occurrences / 2 iters
    assert rows[0]["category"] == "loop fusion"
    assert all(r["name"] != "python" for r in rows)
