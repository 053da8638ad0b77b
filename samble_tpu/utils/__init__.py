from samble_tpu.utils.logging import MetricLogger
from samble_tpu.utils.profiling import flops_estimate, step_timer

__all__ = ["MetricLogger", "flops_estimate", "step_timer"]
