"""Device mesh construction and axis conventions.

This replaces the reference's entire torch.distributed stack
(reference: srt/distributed/parallel_state.py:168 GroupCoordinator,
:1196 initialize_model_parallel, plus pynccl / custom all-reduce device
communicators). On TPU none of that machinery is hand-written: we build one
`jax.sharding.Mesh` whose axes map onto ICI (intra-slice) and DCN
(multi-slice), annotate shardings, and let XLA insert and schedule the
collectives.

Axis conventions (a superset of the reference's tp/dp/ep sizes,
server_args.py:136-187):

- ``data``   — data parallel replicas (batch dim of serving batches)
- ``tensor`` — tensor parallelism (attention heads / MLP columns)
- ``expert`` — expert parallelism for MoE (folded into ``tensor`` when unused)

Pipeline parallelism is intentionally absent: on a TPU pod slice, larger TP
over ICI strictly dominates PP for serving (SURVEY.md §7 phase 4).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import AxisType, Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
TENSOR_AXIS = "tensor"
EXPERT_AXIS = "expert"


@dataclasses.dataclass
class MeshContext:
    """A mesh plus convenience sharding constructors."""

    mesh: Mesh

    @property
    def tp_size(self) -> int:
        return self.mesh.shape[TENSOR_AXIS]

    @property
    def dp_size(self) -> int:
        return self.mesh.shape[DATA_AXIS]

    def sharding(self, *spec) -> NamedSharding:
        return NamedSharding(self.mesh, P(*spec))

    @property
    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())


def create_mesh(
    tp_size: int = 1,
    dp_size: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> MeshContext:
    """Build a (data, tensor) mesh.

    Device order: TP groups are contiguous in device order so that the
    tensor axis rides the fastest ICI links; DP replicas stack above.
    """
    if devices is None:
        devices = jax.devices()
    n = tp_size * dp_size
    if len(devices) < n:
        raise ValueError(
            f"need {n} devices for dp={dp_size} x tp={tp_size}, have {len(devices)}"
        )
    dev_array = np.asarray(devices[:n]).reshape(dp_size, tp_size)
    mesh = Mesh(
        dev_array,
        (DATA_AXIS, TENSOR_AXIS),
        axis_types=(AxisType.Auto, AxisType.Auto),
    )
    return MeshContext(mesh=mesh)


def single_device_mesh(device: Optional[jax.Device] = None) -> MeshContext:
    devs = [device] if device is not None else jax.devices()[:1]
    return create_mesh(tp_size=1, dp_size=1, devices=devs)
