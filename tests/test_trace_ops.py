"""Op-category bucketing of the trace breakdown tool (benchmarks/trace_ops.py)."""
import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "trace_ops",
    os.path.join(os.path.dirname(__file__), "..", "benchmarks", "trace_ops.py"),
)
trace_ops = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(trace_ops)


def test_collectives_not_bucketed_as_reduce():
    # XLA spells collectives with hyphens; they must hit 'collective'
    # before the bare 'reduce' pattern
    assert trace_ops.categorize("all-reduce.123") == "collective"
    assert trace_ops.categorize("reduce-scatter.45") == "collective"
    assert trace_ops.categorize("all-gather.7") == "collective"
    assert trace_ops.categorize("all-to-all.1") == "collective"
    assert trace_ops.categorize("collective-permute.2") == "collective"
    assert trace_ops.categorize("reduce.99") == "reduce"
    assert trace_ops.categorize("reduce-window.3") == "reduce"


def test_pool_backward_not_bucketed_as_scatter():
    assert trace_ops.categorize("select-and-scatter.8") == "select-and-scatter (pool bwd)"
    assert trace_ops.categorize("scatter.11") == "scatter/gather"
    assert trace_ops.categorize("gather.12") == "scatter/gather"


def test_specific_ops_win_over_fusion_bucket():
    assert trace_ops.categorize("fusion.1 convolution.2") == "convolution"
    assert trace_ops.categorize("loop_fusion.5") == "loop/elementwise fusion"


def test_hlo_category_arg_is_authoritative():
    # TPU traces put the truth in args['hlo_category']; bare "fusion.N"
    # names say nothing (a convolution fusion would otherwise land in the
    # elementwise bucket)
    assert trace_ops.categorize("fusion.2484", "convolution fusion") == "convolution fusion"
    assert trace_ops.categorize("fusion.97", "loop fusion") == "loop fusion"
    assert trace_ops.categorize("copy.2303", "") == "data formatting"


def test_module_and_async_tracks_are_dropped():
    # 'XLA Modules' carries one whole-program span per dispatch (would
    # double every total); 'Async XLA Ops' spans overlap real ops
    assert trace_ops.is_device_track("/device:TPU:0", "XLA Ops")
    assert not trace_ops.is_device_track("/device:TPU:0", "XLA Modules")
    assert not trace_ops.is_device_track("/device:TPU:0", "Async XLA Ops")
    assert not trace_ops.is_device_track("/device:TPU:0", "Steps")
    assert not trace_ops.is_device_track("/device:TPU:0", "TC Overlay")
    assert not trace_ops.is_device_track("/device:TPU:0", "Scalar Unit")
