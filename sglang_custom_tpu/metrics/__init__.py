from sglang_custom_tpu.metrics.collector import (
    SchedulerMetricsCollector,
    TokenizerMetricsCollector,
)

__all__ = ["SchedulerMetricsCollector", "TokenizerMetricsCollector"]
