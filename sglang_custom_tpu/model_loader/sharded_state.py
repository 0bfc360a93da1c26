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
    # Detect the quantized-leaf case EXPLICITLY from the checkpoint's saved
    # tree structure instead of catching every restore failure — a bare
    # fallback masked corruption/shape mismatches and abandoned the
    # sharded-restore guarantee (round-3 advisor medium finding).
    meta = ckptr.metadata(path).item_metadata.tree
    if jax.tree.structure(meta) == jax.tree.structure(abstract):
        return ckptr.restore(path, abstract)
    # Quantized checkpoints replace projection leaves with
    # {qweight, scales, ...} dicts. Rebuild the abstract tree from the
    # SAVED structure, pairing each quantized dict with the original
    # weight's sharding (split like loader._quant_shardings does) so the
    # restore still materializes directly into serving shardings.
    from jax.sharding import NamedSharding

    from sglang_custom_tpu.model_loader.loader import _quant_shardings

    def build(mnode, shnode):
        if isinstance(mnode, dict):
            if "qweight" in mnode and isinstance(shnode, NamedSharding):
                sds = {
                    k: jax.ShapeDtypeStruct(tuple(v.shape), v.dtype)
                    for k, v in mnode.items()
                }
                qsh = _quant_shardings(sds, shnode, mesh_ctx)
                return {
                    k: jax.ShapeDtypeStruct(
                        v.shape, v.dtype, sharding=qsh[k]
                    )
                    for k, v in sds.items()
                }
            return {
                k: build(v, shnode[k] if isinstance(shnode, dict) else shnode)
                for k, v in mnode.items()
            }
        sh = shnode if isinstance(shnode, NamedSharding) else mesh_ctx.replicated
        d = dtype if mnode.dtype == jnp.bfloat16 else mnode.dtype
        return jax.ShapeDtypeStruct(tuple(mnode.shape), d, sharding=sh)

    abstract_q = build(meta, shardings)
    return ckptr.restore(path, abstract_q)
