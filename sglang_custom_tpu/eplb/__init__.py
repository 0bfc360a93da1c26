from sglang_custom_tpu.eplb.expert_distribution import ExpertDistributionRecorder
from sglang_custom_tpu.eplb.expert_location import (
    ExpertLocationMetadata,
    rebalance_experts,
)

__all__ = [
    "ExpertDistributionRecorder", "ExpertLocationMetadata", "rebalance_experts",
]
