"""Multi-instance experiment framework.

Analog of the fork's sglang_test_framework/ (reference:
sglang_test_framework/core/{server_manager,request_generator,
metrics_collector,result_manager}.py — spawn N workers + router, generate
poisson load, collect per-request lifecycle metrics, export CSV/JSON).
"""

from sglang_custom_tpu.test_framework.metrics_collector import (
    MetricsCollector,
    RequestRecord,
)
from sglang_custom_tpu.test_framework.request_generator import (
    RequestGenerator,
    SyntheticRequest,
)
from sglang_custom_tpu.test_framework.server_manager import ServerManager

__all__ = [
    "MetricsCollector",
    "RequestRecord",
    "RequestGenerator",
    "SyntheticRequest",
    "ServerManager",
]
