from ramdsir_tpu.utils.logging import MetricsWriter, make_grid  # noqa: F401
from ramdsir_tpu.utils.profiler import StepTimer, trace_context  # noqa: F401
