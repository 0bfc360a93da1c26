"""Tensor-parallel sharding rules for model parameters.

This is the whole of the reference's TP layer machinery
(reference: srt/layers/linear.py ColumnParallelLinear / RowParallelLinear /
QKVParallelLinear, srt/layers/vocab_parallel_embedding.py) re-expressed as
*data placement*: each weight gets a PartitionSpec over the mesh; GSPMD
derives the activation shardings and inserts the all-reduces that the
reference codes by hand (o_proj / down_proj row-parallel reductions).
"""

from __future__ import annotations

from jax.sharding import NamedSharding, PartitionSpec as P

from sglang_custom_tpu.config.model_config import ModelConfig
from sglang_custom_tpu.parallel.mesh import MeshContext, TENSOR_AXIS


def param_shardings(cfg: ModelConfig, mesh_ctx: MeshContext) -> dict:
    """Pytree of NamedShardings matching models.llama.param_shapes."""
    tp = mesh_ctx.tp_size
    t = TENSOR_AXIS

    def sh(*spec):
        return mesh_ctx.sharding(*spec)

    def div(n):
        return n % tp == 0

    qkv_col = sh(None, None, t) if div(cfg.num_q_heads * cfg.head_dim) else sh()
    kv_col = sh(None, None, t) if div(cfg.num_kv_heads * cfg.head_dim) else sh()
    mlp_col = sh(None, None, t) if div(cfg.intermediate_size) else sh()
    layers = {
        "input_norm": sh(),
        "q_proj": qkv_col,
        "k_proj": kv_col,
        "v_proj": kv_col,
        "o_proj": sh(None, t, None) if div(cfg.num_q_heads * cfg.head_dim) else sh(),
        "post_norm": sh(),
        "gate_proj": mlp_col,
        "up_proj": mlp_col,
        "down_proj": sh(None, t, None) if div(cfg.intermediate_size) else sh(),
    }
    if cfg.attention_bias:
        layers["q_bias"] = sh(None, t) if div(cfg.num_q_heads * cfg.head_dim) else sh()
        layers["k_bias"] = sh(None, t) if div(cfg.num_kv_heads * cfg.head_dim) else sh()
        layers["v_bias"] = sh(None, t) if div(cfg.num_kv_heads * cfg.head_dim) else sh()
    if cfg.qk_norm:
        layers["q_norm"] = sh()
        layers["k_norm"] = sh()
    return {
        "embed": sh(t, None) if div(cfg.vocab_size) else sh(),
        "layers": layers,
        "final_norm": sh(),
        "lm_head": sh(None, t) if div(cfg.vocab_size) else sh(),
    }
