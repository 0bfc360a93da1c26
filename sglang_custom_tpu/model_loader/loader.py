"""Model weight loading.

Analog of the reference's loader stack (reference:
srt/model_loader/loader.py:202 DefaultModelLoader safetensors streaming,
:531 DummyModelLoader for perf-only runs). Weights are read per safetensors
shard, remapped from HF names into the stacked-[L, ...] layout that the
scanned model consumes, and device_put with their TP shardings — the
device never holds an unsharded copy.
"""

from __future__ import annotations

import glob
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from sglang_custom_tpu.config.model_config import ModelConfig
from sglang_custom_tpu.models.registry import get_model
from sglang_custom_tpu.parallel.mesh import MeshContext
from sglang_custom_tpu.utils import get_logger

logger = get_logger(__name__)


def load_weights(
    model_path: str,
    cfg: ModelConfig,
    mesh_ctx: MeshContext,
    dtype: jnp.dtype = jnp.bfloat16,
) -> dict:
    """Load HF safetensors into the stacked sharded pytree."""
    from safetensors import safe_open

    files = sorted(glob.glob(os.path.join(model_path, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no safetensors under {model_path}")

    model = get_model(cfg.architecture)
    shardings = model.param_shardings(cfg, mesh_ctx)
    shapes = model.param_shapes(cfg)

    # Host staging buffers (fp32 numpy keeps safetensors-numpy happy; cast on
    # device_put).
    staging = jax.tree.map(lambda s: np.zeros(s.shape, np.float32), shapes)

    key_map = model.hf_key_map(cfg)

    seen = set()
    for f in files:
        # framework="pt" keeps reads host-side and handles bf16/fp16/fp32
        # checkpoints uniformly (numpy can't represent bf16; flax would place
        # tensors on the accelerator).
        with safe_open(f, framework="pt") as st:
            for name in st.keys():
                if name not in key_map:
                    if "rotary_emb" not in name:
                        logger.debug("skipping unmapped weight %s", name)
                    continue
                path, idx, transpose = key_map[name]
                w = st.get_tensor(name).float().numpy()
                if transpose:
                    w = np.ascontiguousarray(w.T)
                dst = staging
                for kpart in path[:-1]:
                    dst = dst[kpart]
                if idx is None:
                    dst[path[-1]][...] = w
                else:
                    # idx is a layer index, or (layer, expert) for MoE
                    dst[path[-1]][idx] = w
                seen.add(name)

    if "lm_head.weight" not in seen:
        if not cfg.tie_word_embeddings:
            logger.warning("lm_head missing and embeddings not tied; tying anyway")
        staging["lm_head"][...] = staging["embed"].T

    # Cast on the host (ml_dtypes handles bf16 in numpy) so each device_put
    # ships final bytes — no per-tensor cast ops on device.
    np_dtype = np.dtype(jnp.dtype(dtype).name)
    return jax.tree.map(
        lambda w, s: jax.device_put(w.astype(np_dtype), s),
        staging,
        shardings,
    )


def load_dummy_weights(
    cfg: ModelConfig,
    mesh_ctx: MeshContext,
    dtype: jnp.dtype = jnp.bfloat16,
    seed: int = 0,
) -> dict:
    """Random-init weights for perf-only runs (reference: DummyModelLoader,
    model_loader/loader.py:531 / --load-format dummy)."""
    model = get_model(cfg.architecture)
    shapes = model.param_shapes(cfg)
    shardings = model.param_shardings(cfg, mesh_ctx)
    path_leaves, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    keys = list(jax.random.split(jax.random.PRNGKey(seed), len(path_leaves)))

    np_dtype = np.dtype(jnp.dtype(dtype).name)
    rng = np.random.Generator(np.random.SFC64(seed))
    # One random block, tiled: dummy weights only need plausible magnitudes,
    # not independence — generating ~1e9 gaussians per model is pure waste.
    block = (rng.standard_normal(1 << 20, dtype=np.float32) * 0.02).astype(np_dtype)

    def init(path, shape_struct, sharding, key):
        # Host-side generation: a device-side random-init would pay one
        # remote compile per tensor; dummy weights are perf-only anyway.
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if "norm" in name:
            w = np.ones(shape_struct.shape, np_dtype)
        else:
            n = int(np.prod(shape_struct.shape))
            reps = -(-n // block.size)
            w = np.tile(block, reps)[:n].reshape(shape_struct.shape)
        return jax.device_put(w, sharding)

    out_leaves = [
        init(path, s, sh, k)
        for (path, s), sh, k in zip(
            path_leaves, jax.tree.flatten(shardings)[0], keys
        )
    ]
    return jax.tree.unflatten(treedef, out_leaves)
