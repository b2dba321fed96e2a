"""Unit tests for the shared Chrome-trace parser (utils/trace.py)."""

import numpy as np

from text_to_sound_synthesis_tpu.utils.trace import DeviceTrace


def _synthetic():
    return {
        "traceEvents": [
            {"ph": "M", "name": "process_name", "pid": 1,
             "args": {"name": "/device:TPU:0"}},
            {"ph": "M", "name": "process_name", "pid": 2,
             "args": {"name": "python host"}},
            # device rows
            {"ph": "X", "pid": 1, "name": "jit_run(123)", "dur": 1000.0},
            {"ph": "X", "pid": 1, "name": "while", "dur": 990.0},
            {"ph": "X", "pid": 1, "name": "fusion.1", "dur": 300.0,
             "args": {"hlo_category": "loop fusion"}},
            {"ph": "X", "pid": 1, "name": "fusion.2", "dur": 200.0,
             "args": {"hlo_category": "loop fusion"}},
            {"ph": "X", "pid": 1, "name": "convert_reduce_fusion.7",
             "dur": 400.0, "args": {"hlo_category": "convolution fusion"}},
            {"ph": "X", "pid": 1, "name": "copy.3", "dur": 50.0},
            # host row must be ignored
            {"ph": "X", "pid": 2, "name": "np.asarray", "dur": 5000.0},
            # non-X device row ignored
            {"ph": "B", "pid": 1, "name": "fusion.9"},
        ]
    }


def test_device_filtering_and_totals():
    tr = DeviceTrace.from_trace_json(_synthetic())
    assert len(tr.events) == 6
    assert tr.jit_wrapper_us() == 1000.0
    # wrappers (jit_, while) excluded from op totals
    assert tr.total_us() == 300 + 200 + 400 + 50
    assert tr.total_us(include_wrappers=True) == 1000 + 990 + 950


def test_by_name_aggregation():
    tr = DeviceTrace.from_trace_json(_synthetic())
    rows = dict(tr.by_name())
    assert rows["fusion.1"] == (300.0, 1)
    folded = dict(tr.by_name(strip_instance=True))
    assert folded["fusion"] == (500.0, 2)
    assert folded["convert_reduce_fusion"] == (400.0, 1)
    top1 = tr.by_name(strip_instance=True, top=1)
    assert top1[0][0] == "fusion"


def test_by_category_attributes_conv_named_reduce():
    """The ROOFLINE lesson: a 'convert_reduce_fusion' event can be a
    convolution fusion — category attribution must expose that."""
    tr = DeviceTrace.from_trace_json(_synthetic())
    cats = dict(tr.by_category())
    assert cats["convolution fusion"] == (400.0, 1)
    assert cats["loop fusion"] == (500.0, 2)
    assert cats["?"] == (50.0, 1)


def test_matching():
    tr = DeviceTrace.from_trace_json(_synthetic())
    assert tr.matching(r"^fusion") == 500.0
    assert tr.matching(r"copy") == 50.0
