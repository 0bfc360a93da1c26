"""Probe: jax.distributed on localhost CPU, global mesh, sharded jit."""
import os
import sys

rank = int(sys.argv[1])
nprocs = int(sys.argv[2])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address="127.0.0.1:29555",
    num_processes=nprocs,
    process_id=rank,
)
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

devs = jax.devices()
print(f"[rank {rank}] global devices: {len(devs)} local: {len(jax.local_devices())}", flush=True)
mesh = Mesh(np.asarray(devs).reshape(2, len(devs) // 2), ("data", "tensor"))

x_host = np.arange(16, dtype=np.float32).reshape(4, 4)
sharding = NamedSharding(mesh, P("data", None))
# replicated-host data -> global array (each process provides its shards)
x = jax.make_array_from_callback((4, 4), sharding, lambda idx: x_host[idx])

@jax.jit
def f(x):
    return (x * 2).sum(axis=1)

y = f(x)
out = __import__("jax.experimental.multihost_utils", fromlist=["x"]).process_allgather(y, tiled=True)
print(f"[rank {rank}] result: {out.ravel()[:4]}", flush=True)
print(f"[rank {rank}] OK", flush=True)
