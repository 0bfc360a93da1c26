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

# Projections eligible for weight quantization (embed/lm_head/norms stay
# high precision, matching the reference's exclude lists).
QUANTIZABLE = {
    "q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj",
    "down_proj",
}


def _quantize_leaf(name: str, w, method: str, group_size: int):
    """[.., K, N] float stack -> dict of stacked quantized arrays."""
    from sglang_custom_tpu.layers.quantization import (
        quantize_fp8,
        quantize_fp8_blockwise,
        quantize_int8,
        quantize_w4a16,
    )

    lead = w.shape[:-2]
    flat = w.reshape((-1,) + w.shape[-2:])
    outs = []
    for i in range(flat.shape[0]):
        if method == "fp8":
            outs.append(quantize_fp8(flat[i]))
        elif method == "fp8_block":
            outs.append(quantize_fp8_blockwise(flat[i]))
        elif method == "int8":
            outs.append(quantize_int8(flat[i]))
        else:
            outs.append(quantize_w4a16(flat[i], group_size))
    stacked = {
        k: np.stack([o[k] for o in outs]).reshape(
            lead + outs[0][k].shape
        )
        for k in outs[0]
    }
    return stacked


def _quant_shardings(qleaf: dict, orig_sharding, mesh_ctx: MeshContext):
    """Shard quantized arrays like the original weight where divisible."""
    from jax.sharding import NamedSharding

    spec = orig_sharding.spec
    mesh = mesh_ctx.mesh

    def fits(arr):
        for dim, axis in zip(arr.shape, spec):
            if axis is not None and dim % mesh.shape[axis] != 0:
                return False
        return len(spec) <= arr.ndim

    return {
        k: (
            NamedSharding(mesh, spec)
            if fits(v)
            else mesh_ctx.replicated
        )
        for k, v in qleaf.items()
    }


def _apply_quantization(staging, shardings, method: str, group_size: int,
                        mesh_ctx: MeshContext):
    """Replace quantizable layer leaves with quantized dicts (in both the
    staging tree and the sharding tree)."""
    if "layers" not in staging:
        logger.warning("load-time quantization unsupported for this "
                       "architecture's layout; serving unquantized")
        return staging, shardings
    layers = staging["layers"]
    for name in list(layers.keys()):
        if name in QUANTIZABLE:
            q = _quantize_leaf(name, layers[name], method, group_size)
            layers[name] = q
            shardings["layers"][name] = _quant_shardings(
                q, shardings["layers"][name], mesh_ctx
            )
    return staging, shardings


def _check_coverage(key_map: dict, written: set) -> None:
    """Fail loudly when a mapped destination never received a checkpoint
    tensor (round-3 advisor high finding: zero-filled projections served as
    garbage). Norm destinations warn instead — load_weights coerces them to
    identity, the correct behavior for EAGLE-style drafts that drop them."""
    expected = set()
    for entries in key_map.values():
        if not isinstance(entries, list):
            entries = [entries]
        for entry in entries:
            path, idx = entry[0], entry[1]
            expected.add((path, idx))
    missing = expected - written
    if not missing:
        return
    hard, soft = [], []
    for path, idx in sorted(missing, key=str):
        leaf = path[-1]
        tgt = f"{'/'.join(path)}[{idx}]" if idx is not None else "/".join(path)
        (soft if "norm" in leaf else hard).append(tgt)
    if soft:
        logger.warning(
            "checkpoint missing %d norm weight(s) (coerced to identity): %s",
            len(soft), ", ".join(soft[:8]) + ("..." if len(soft) > 8 else ""),
        )
    if hard:
        raise ValueError(
            f"checkpoint left {len(hard)} mapped weight(s) unloaded — "
            f"refusing to serve zero-filled parameters: "
            + ", ".join(hard[:12])
            + ("..." if len(hard) > 12 else "")
        )


def load_weights(
    model_path: str,
    cfg: ModelConfig,
    mesh_ctx: MeshContext,
    dtype: jnp.dtype = jnp.bfloat16,
    quantization: str = None,
    model=None,
) -> dict:
    """Load HF safetensors into the stacked sharded pytree.

    ``quantization`` (w4a16 | fp8) quantizes a float checkpoint at load
    time; AWQ/GPTQ checkpoints are detected from the HF config and their
    packed tensors converted directly (reference: model_loader/loader.py:202
    + per-method QuantizationConfig weight loading)."""
    from safetensors import safe_open

    files = sorted(glob.glob(os.path.join(model_path, "*.safetensors")))
    if not files:
        from sglang_custom_tpu.model_loader.gguf_loader import (
            gguf_path_of,
            load_weights_gguf,
        )

        g = gguf_path_of(model_path)
        if g:
            return load_weights_gguf(
                g, cfg, mesh_ctx, dtype, quantization=quantization,
                model=model,
            )
        raise FileNotFoundError(
            f"no safetensors or gguf under {model_path}"
        )

    if model is None:
        model = get_model(cfg.architecture)
    shardings = model.param_shardings(cfg, mesh_ctx)
    shapes = model.param_shapes(cfg)

    key_map = model.hf_key_map(cfg)

    if cfg.quantization in ("awq", "gptq", "compressed-tensors"):
        return _load_prequantized(
            files, cfg, model, key_map, shapes, shardings, mesh_ctx, dtype
        )

    if cfg.quantization == "bitsandbytes":
        # bnb nf4/fp4/int8 dequantized on host (model_loader/bnb_loader.py
        # — reference loader.py:765 BitsAndBytesModelLoader); the float
        # view then flows through the normal staging loop and may be
        # re-quantized to the TPU W4A16 layout via --quantization.
        from sglang_custom_tpu.model_loader.bnb_loader import BnbStateDict

        files = [BnbStateDict(files)]

    # Host staging buffers (fp32 numpy keeps safetensors-numpy happy; cast on
    # device_put).
    staging = jax.tree.map(lambda s: np.zeros(s.shape, np.float32), shapes)

    seen = set()
    written = set()  # (path, idx) destinations that received a tensor
    for f in files:
        # framework="pt" keeps reads host-side and handles bf16/fp16/fp32
        # checkpoints uniformly (numpy can't represent bf16; flax would place
        # tensors on the accelerator). A BnbStateDict is already its own
        # safe_open-shaped context.
        with (f if not isinstance(f, str)
              else safe_open(f, framework="pt")) as st:
            for name in st.keys():
                if name not in key_map:
                    if "rotary_emb" not in name:
                        logger.debug("skipping unmapped weight %s", name)
                    continue
                entries = key_map[name]
                if not isinstance(entries, list):
                    entries = [entries]
                full = st.get_tensor(name).float().numpy()
                for entry in entries:
                    # optional 4th element: (row_start, row_end) slice of
                    # the HF tensor — fused checkpoints (phi3 qkv_proj,
                    # gate_up_proj) split into our per-proj leaves
                    if len(entry) == 4:
                        path, idx, transpose, sl = entry
                        w = full[sl[0] : sl[1]]
                    else:
                        path, idx, transpose = entry
                        w = full
                    if transpose:
                        # conv-as-matmul weights (qwen2.5-vl patch embed
                        # Conv3d [D, C, T, P, P]) flatten to [D, -1] first
                        if w.ndim > 2:
                            w = w.reshape(w.shape[0], -1)
                        w = np.ascontiguousarray(w.T)
                    dst = staging
                    for kpart in path[:-1]:
                        dst = dst[kpart]
                    if idx is None:
                        dst[path[-1]][...] = w
                    else:
                        # idx is a layer index, or (layer, expert) for MoE
                        dst[path[-1]][idx] = w
                    written.add((path, idx))
                seen.add(name)

    if (
        not any(n.endswith("lm_head.weight") for n in seen)
        and "lm_head" in staging
    ):
        if not cfg.tie_word_embeddings:
            logger.warning("lm_head missing and embeddings not tied; tying anyway")
        staging["lm_head"][...] = staging["embed"].T
        written.add((("lm_head",), None))

    # Coverage check: every destination the key map declares must have
    # received a checkpoint tensor. Serving zero-filled projections is a
    # silent-garbage failure (round-3 advisor, high); missing NORM leaves
    # only warn — they are coerced to identity below, which is the correct
    # handling for checkpoints that legitimately drop them (EAGLE drafts).
    _check_coverage(key_map, written)

    # Norm weights never shipped in the checkpoint (e.g. EAGLE drafts drop
    # the first input_layernorm) must be identity, not the zero staging init.
    for norm_key in ("input_norm", "post_norm"):
        w = staging.get("layers", {}).get(norm_key)
        if w is not None:
            rows = ~np.any(w, axis=tuple(range(1, w.ndim)))
            w[rows] = 1.0

    # Model-owned weight fix-ups (e.g. gemma folds its zero-centered norm
    # convention into the stored weights — models/gemma.py).
    if hasattr(model, "postprocess_weights"):
        model.postprocess_weights(staging, cfg)

    if quantization in ("w4a16", "fp8", "fp8_block", "int8"):
        staging, shardings = _apply_quantization(
            staging, shardings, quantization, cfg.quant_group_size, mesh_ctx
        )

    return _put_tree(staging, shardings, dtype)


def _put_tree(staging, shardings, dtype) -> dict:
    """device_put the staged tree. Non-quantized fp32 weights are cast to
    the model dtype on the host (ml_dtypes handles bf16 in numpy) so each
    device_put ships final bytes; quantized dict leaves (qweight + fp32
    scales/zeros) keep their exact dtypes."""
    np_dtype = np.dtype(jnp.dtype(dtype).name)

    def walk(node, snode, quantized=False):
        if isinstance(node, dict):
            is_q = "qweight" in node
            return {
                k: walk(v, snode[k], quantized or is_q)
                for k, v in node.items()
            }
        w = node
        if not quantized and w.dtype in (np.float32, np.float64):
            w = w.astype(np_dtype)
        return jax.device_put(w, snode)

    return walk(staging, shardings)


def _load_prequantized(
    files, cfg, model, key_map, shapes, shardings, mesh_ctx, dtype
) -> dict:
    """AWQ/GPTQ safetensors -> our packed W4A16 layout.

    reference: layers/quantization/awq.py / gptq.py weight loading; tensor
    packing documented in quantization/w4a16.py convert_* docstrings."""
    from safetensors import safe_open

    from sglang_custom_tpu.layers.quantization.w4a16 import (
        convert_awq_tensors,
        convert_gptq_tensors,
    )

    # hf "...<proj>.weight" -> expect qweight/qzeros/scales(/g_idx) instead
    quant_names = {}
    float_map = {}
    for hf_name, entry in key_map.items():
        if isinstance(entry, list):
            raise NotImplementedError(
                "pre-quantized checkpoints with fused projections "
                "(phi3-style) are not supported yet"
            )
        path, idx, transpose = entry
        if hf_name.endswith(".weight") and path[-1] in QUANTIZABLE:
            base = hf_name[: -len(".weight")]
            quant_names[base] = (path, idx)
        else:
            float_map[hf_name] = (path, idx, transpose)

    # compressed-tensors stores the quantized tensor under ".weight" itself
    # with ".weight_scale"/"..._zero_point" companions; AWQ/GPTQ use
    # ".qweight"/".qzeros"/".scales"(/".g_idx").
    is_ct = cfg.quantization == "compressed-tensors"
    ct_wanted = set()
    if is_ct:
        for base in quant_names:
            ct_wanted.update(
                base + s
                for s in (".weight", ".weight_scale", ".weight_zero_point",
                          ".input_scale")
            )

    def read_raw(st, name):
        import torch

        t = st.get_tensor(name)
        if t.dtype == torch.float8_e4m3fn:
            return t.view(torch.uint8).numpy().view(np.dtype("float8_e4m3fn"))
        return t.numpy()

    staging = jax.tree.map(lambda s: np.zeros(s.shape, np.float32), shapes)
    raw = {}
    seen = set()
    for f in files:
        with safe_open(f, framework="pt") as st:
            for name in st.keys():
                if is_ct:
                    if name in ct_wanted:
                        raw[name] = read_raw(st, name)
                        continue
                    if name in float_map:
                        path, idx, transpose = float_map[name]
                        w = st.get_tensor(name).float().numpy()
                        if transpose:
                            w = np.ascontiguousarray(w.T)
                        dst = staging
                        for kpart in path[:-1]:
                            dst = dst[kpart]
                        if idx is None:
                            dst[path[-1]][...] = w
                        else:
                            dst[path[-1]][idx] = w
                        seen.add(name)
                    continue
                for suffix in (".qweight", ".qzeros", ".scales", ".g_idx"):
                    if name.endswith(suffix):
                        raw[name] = st.get_tensor(name).numpy()
                        break
                else:
                    if name in float_map:
                        path, idx, transpose = float_map[name]
                        w = st.get_tensor(name).float().numpy()
                        if transpose:
                            w = np.ascontiguousarray(w.T)
                        dst = staging
                        for kpart in path[:-1]:
                            dst = dst[kpart]
                        if idx is None:
                            dst[path[-1]][...] = w
                        else:
                            dst[path[-1]][idx] = w
                        seen.add(name)

    if not any(n.endswith("lm_head.weight") for n in seen):
        staging["lm_head"][...] = staging["embed"].T

    # assemble quantized leaves
    qlayers = {}
    for base, (path, idx) in quant_names.items():
        name = path[-1]
        if is_ct:
            from sglang_custom_tpu.layers.quantization.compressed_tensors import (
                convert_ct_tensors,
            )

            qw = raw.get(base + ".weight")
            if qw is None:
                raise FileNotFoundError(f"missing {base}.weight")
            qd = convert_ct_tensors(
                qw,
                raw.get(base + ".weight_scale"),
                raw.get(base + ".weight_zero_point"),
            )
            qlayers.setdefault(name, {})[idx] = qd
            continue
        qw = raw.get(base + ".qweight")
        if qw is None:
            raise FileNotFoundError(f"missing {base}.qweight")
        if cfg.quantization == "awq":
            qd = convert_awq_tensors(
                qw, raw[base + ".qzeros"], raw[base + ".scales"]
            )
        else:
            qd = convert_gptq_tensors(
                qw, raw[base + ".qzeros"], raw[base + ".scales"],
                raw.get(base + ".g_idx"),
            )
        slot = qlayers.setdefault(name, {})
        slot[idx] = qd

    layers = staging["layers"]
    for name, per_idx in qlayers.items():
        idxs = sorted(per_idx.keys(), key=lambda x: (x,) if isinstance(x, int) else x)
        sample = per_idx[idxs[0]]
        orig_shape = layers[name].shape  # [L, K, N] or [L, E, K, N]
        lead = orig_shape[:-2]
        stacked = {}
        for k in sample:
            arrs = np.stack([per_idx[i][k] for i in idxs])
            stacked[k] = arrs.reshape(lead + sample[k].shape)
        layers[name] = stacked
        shardings["layers"][name] = _quant_shardings(
            stacked, shardings["layers"][name], mesh_ctx
        )

    return _put_tree(staging, shardings, dtype)


def _load_dummy_quantized(
    cfg, shapes, shardings, mesh_ctx, dtype, seed: int, method: str
) -> dict:
    """Dummy weights with quantized leaves synthesized directly in their
    final layout (matching quantize_w4a16/fp8/int8/fp8_blockwise output
    shapes exactly) — same executables as a real quantized load, minutes
    less host time."""
    np_dtype = np.dtype(jnp.dtype(dtype).name)
    rng = np.random.Generator(np.random.SFC64(seed))
    fblock = (rng.standard_normal(1 << 20, dtype=np.float32) * 0.02).astype(
        np_dtype
    )
    ublock = rng.integers(0, 256, size=1 << 20, dtype=np.uint8)
    # e4m3 block cast from small floats: stays finite (no 0x7f NaN patterns)
    f8block = (
        rng.standard_normal(1 << 20, dtype=np.float32) * 8.0
    ).astype(np.dtype("float8_e4m3fn"))
    i8block = rng.integers(-127, 128, size=1 << 20, dtype=np.int8)

    def tile(block, shape):
        n = int(np.prod(shape))
        reps = -(-n // block.size)
        return np.tile(block, reps)[:n].reshape(shape)

    def synth_q(shape):
        lead, (K, N) = tuple(shape[:-2]), shape[-2:]
        if method == "w4a16":
            G = min(cfg.quant_group_size, K)
            return {
                "qweight": tile(ublock, lead + (K // 2, N)),
                "scales": np.full(lead + (K // G, N), 0.004, np.float32),
                "zeros": np.full(lead + (K // G, N), -0.03, np.float32),
            }
        if method == "fp8":
            return {
                "qweight": tile(f8block, lead + (K, N)),
                "scales": np.full(lead + (N,), 0.02 / 8.0, np.float32),
            }
        if method == "int8":
            return {
                "qweight": tile(i8block, lead + (K, N)),
                "scales": np.full(lead + (N,), 0.02 / 127.0, np.float32),
            }
        # fp8_block (blockwise_fp8.quantize_fp8_blockwise layout)
        B = min(128, K, N)
        return {
            "qweight": tile(f8block, lead + (K, N)),
            "scales": np.full(
                lead + (K // B, N // B), 0.02 / 8.0, np.float32
            ),
        }

    out = {}
    for key, node in shapes.items():
        if key == "layers":
            lsh = {}
            for name, s in node.items():
                if name in QUANTIZABLE:
                    q = synth_q(s.shape)
                    qsh = _quant_shardings(
                        q, shardings["layers"][name], mesh_ctx
                    )
                    lsh[name] = {
                        k: jax.device_put(v, qsh[k]) for k, v in q.items()
                    }
                else:
                    w = (
                        np.ones(s.shape, np_dtype)
                        if "norm" in name
                        else tile(fblock, s.shape)
                    )
                    lsh[name] = jax.device_put(
                        w, shardings["layers"][name]
                    )
            out["layers"] = lsh
        else:
            sub_shapes = {key: node}
            sub_sh = {key: shardings[key]}
            leaves, treedef = jax.tree_util.tree_flatten_with_path(sub_shapes)
            sh_leaves = jax.tree.flatten(sub_sh)[0]
            vals = []
            for (p, s), sh in zip(leaves, sh_leaves):
                nm = "/".join(str(getattr(x, "key", x)) for x in p)
                w = (
                    np.ones(s.shape, np_dtype)
                    if "norm" in nm
                    else tile(fblock, s.shape)
                )
                vals.append(jax.device_put(w, sh))
            out.update(jax.tree_util.tree_unflatten(treedef, vals))
    return out


def load_dummy_weights(
    cfg: ModelConfig,
    mesh_ctx: MeshContext,
    dtype: jnp.dtype = jnp.bfloat16,
    seed: int = 0,
    quantization: str = None,
    model=None,
) -> dict:
    """Random-init weights for perf-only runs (reference: DummyModelLoader,
    model_loader/loader.py:531 / --load-format dummy)."""
    if model is None:
        model = get_model(cfg.architecture)
    shapes = model.param_shapes(cfg)
    shardings = model.param_shardings(cfg, mesh_ctx)

    if quantization in ("w4a16", "fp8", "fp8_block", "int8"):
        # Synthesize the quantized leaves DIRECTLY (same shapes/dtypes as
        # quantize_* would emit) instead of generating ~4 bytes/param of
        # fp32 floats and quantizing them on the host: on the 2-vCPU bench
        # host the float path took 4+ minutes and ~29 GB RSS for Llama-3-8B
        # — most of the round-3 w4a16_8b bench's setup timeout.
        return _load_dummy_quantized(
            cfg, shapes, shardings, mesh_ctx, dtype, seed, quantization
        )
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
