"""Sharded checkpoint save/restore (orbax-backed).

Analog of the reference's ShardedStateLoader
(reference: srt/model_loader/loader.py:654 ShardedStateLoader —
save_model per-rank shard files + load that skips the full-checkpoint
gather). TPU-first: jax arrays already carry their NamedSharding, so
orbax writes each leaf distributed (every host writes only its
addressable shards) and restore materializes leaves directly into the
serving shardings — no host ever stages an unsharded copy, which is the
entire point on multi-chip topologies where the full model exceeds host
RAM.

The checkpoint is a directory keyed by the param pytree (including
quantized dict leaves — qweight/scales are ordinary arrays to orbax).
"""

from __future__ import annotations

import os

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_sharded_state(params: dict, path: str) -> None:
    """Write the (possibly TP/EP-sharded) param pytree under ``path``."""
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()


def load_sharded_state(path: str, cfg, mesh_ctx, dtype, model=None) -> dict:
    """Restore a sharded checkpoint directly into serving shardings.

    The abstract tree is rebuilt from the model's param_shapes/shardings
    (so a checkpoint saved on one topology restores onto another as long
    as the shapes match — orbax reshards on read). Quantized checkpoints
    carry extra dict leaves; for those the saved tree's own structure is
    used instead.
    """
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from sglang_custom_tpu.models.registry import get_model

    path = os.path.abspath(path)
    if model is None:
        model = get_model(cfg.architecture)
    shapes = model.param_shapes(cfg)
    shardings = model.param_shardings(cfg, mesh_ctx)
    abstract = jax.tree.map(
        lambda s, sh: jax.ShapeDtypeStruct(
            s.shape, dtype if s.dtype == jnp.bfloat16 else s.dtype,
            sharding=sh,
        ),
        shapes, shardings,
    )
    ckptr = _checkpointer()
    try:
        return ckptr.restore(path, abstract)
    except Exception:
        # Structure mismatch (e.g. quantized leaves): restore with the
        # stored structure, then re-place onto the mesh default sharding.
        restored = ckptr.restore(path)
        return jax.tree.map(
            lambda v: jax.device_put(v, mesh_ctx.replicated), restored
        )
