"""Model configuration normalized from HuggingFace configs.

Analog of the reference's ``configs/model_config.py`` (HF config
normalization + quantization detection). Kept minimal and functional: a
frozen dataclass that the model code and KV-cache sizing consume.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    architecture: str
    vocab_size: int
    hidden_size: int
    num_layers: int
    num_q_heads: int
    num_kv_heads: int
    head_dim: int
    intermediate_size: int
    rms_norm_eps: float
    rope_theta: float
    max_position_embeddings: int
    tie_word_embeddings: bool = False
    rope_scaling: Optional[dict] = None
    quantization: Optional[str] = None
    # MoE (0 experts == dense)
    num_experts: int = 0
    num_experts_per_tok: int = 0
    moe_intermediate_size: int = 0
    # qwen2-style attention bias
    attention_bias: bool = False
    # qwen3-style per-head RMS norm on q/k before RoPE
    qk_norm: bool = False
    # mixtral/qwen-moe router normalizes top-k weights to sum to 1
    norm_topk_prob: bool = True
    # --- sliding-window attention (gemma2/3, mistral-swa) ---
    # window size in tokens; 0 = no sliding window anywhere
    sliding_window: int = 0
    # per-layer attention kind: tuple of "sliding_attention"/"full_attention"
    # (HF layer_types); None = derived from sliding_window_pattern
    layer_types: Optional[tuple] = None
    # every Nth layer is global (gemma3: 6, gemma2: 2); 0 = all layers full
    sliding_window_pattern: int = 0
    # --- gemma-family extras ---
    attn_logit_softcap: float = 0.0    # gemma2: 50.0
    final_logit_softcap: float = 0.0   # gemma2: 30.0
    query_pre_attn_scalar: float = 0.0 # 0 -> use head_dim
    hidden_act: str = "silu"           # silu | gelu_tanh
    rope_local_theta: float = 0.0      # gemma3 local-layer rope base; 0 = same
    # norm weights stored zero-centered (gemma: effective = 1 + w)
    norm_zero_centered: bool = False
    # scale embeddings by sqrt(hidden_size) (gemma)
    scale_embedding: bool = False
    # --- MLA (DeepSeek V2/V3 latent attention) ---
    kv_lora_rank: int = 0              # 0 = standard MHA/GQA
    q_lora_rank: int = 0               # 0 = direct q projection
    qk_nope_head_dim: int = 0
    qk_rope_head_dim: int = 0
    v_head_dim: int = 0
    # --- DeepSeek MoE routing ---
    n_shared_experts: int = 0
    # Qwen2-MoE dense shared expert beside the routed experts
    # (models/mixtral.py; 0 = none)
    shared_expert_intermediate_size: int = 0
    first_k_dense_replace: int = 0
    routed_scaling_factor: float = 1.0
    topk_method: str = "greedy"        # greedy | group_limited_greedy | noaux_tc
    n_group: int = 1
    topk_group: int = 1
    scoring_func: str = "softmax"      # softmax | sigmoid
    # rope pair layout: interleaved (deepseek-v2 complex pairs) vs half-split
    rope_interleaved: bool = False
    # --- Llama-4 extras (models/llama4.py) ---
    # per-layer rope flags (HF no_rope_layers: 1 = USE rope); None = all rope
    no_rope_layers: Optional[tuple] = None
    # every Nth layer is MoE (1 = all layers); 0 = pure dense
    interleave_moe_layer_step: int = 0
    # dense layers' MLP width (intermediate_size is the expert width)
    intermediate_size_mlp: int = 0
    # NoPE-layer query temperature tuning (arXiv:2501.19399)
    attn_temperature_tuning: bool = False
    floor_scale: float = 8192.0
    attn_scale: float = 0.1
    # weightless L2 qk-norm after rope (vs qk_norm's learned RMS)
    use_qk_norm_l2: bool = False
    # chunked-local attention size on rope layers (0 = full causal)
    attention_chunk_size: int = 0
    # fraction of head_dim that rotates (glm: 0.5); 1.0 = full rope
    partial_rotary_factor: float = 1.0
    # embedding model (bare `XxxModel` HF architecture, e.g. e5-mistral /
    # gte-qwen2): serve pooled hidden states instead of sampled tokens
    # (reference: srt/models/llama.py LlamaEmbeddingModel + is_generation
    # model_config handling)
    is_embedding: bool = False
    # reward / sequence-classification head width (models/classify.py);
    # 0 = not a classification model
    num_labels: int = 0
    # --- multimodal (llava-family; reference: srt/models/llava.py +
    # srt/multimodal/processors/) ---
    # normalized vision-tower config dict (see models/vision_clip.py);
    # None = text-only model
    vision: Optional[dict] = None
    # placeholder token id marking image positions in input_ids
    image_token_id: int = -1
    # multimodal rope (Qwen2-VL family): frequency pairs per (t, h, w)
    # position channel; None = standard rope (reference: rope_scaling
    # mrope_section, forward_batch_info.py:484 mrope positions)
    mrope_section: Optional[tuple] = None

    @property
    def is_multimodal(self) -> bool:
        return self.vision is not None

    @property
    def num_image_tokens(self) -> int:
        """Feature tokens injected per image."""
        v = self.vision
        if "num_image_tokens" in v:
            return v["num_image_tokens"]
        n = (v["image_size"] // v["patch_size"]) ** 2
        if v.get("vision_feature_select_strategy", "default") != "default":
            n += 1  # CLS kept
        return n

    @property
    def q_per_kv(self) -> int:
        return self.num_q_heads // self.num_kv_heads

    # A window value meaning "no window" that is safe in int32 position math.
    FULL_WINDOW = 1 << 30

    @property
    def is_mla(self) -> bool:
        return self.kv_lora_rank > 0

    @property
    def kv_dim_per_token(self) -> int:
        """KV-cache features stored per token (the MLA memory win: one
        latent vector instead of 2 * heads * head_dim)."""
        if self.is_mla:
            return self.kv_lora_rank + self.qk_rope_head_dim
        return 2 * self.num_kv_heads * self.head_dim

    def layer_windows(self) -> list:
        """Per-layer attention window (FULL_WINDOW = global attention).

        Encodes the reference's hybrid sliding-window layout (reference:
        SWAKVPool mem_cache/memory_pool.py:471 keeps separate pools for
        full/swa layers; here the window is simply a per-layer mask bound
        fed to the attention kernel)."""
        full = ModelConfig.FULL_WINDOW
        if not self.sliding_window:
            return [full] * self.num_layers
        if self.layer_types is not None:
            return [
                self.sliding_window if t == "sliding_attention" else full
                for t in self.layer_types
            ]
        if self.sliding_window_pattern:
            # sliding unless (l+1) is a multiple of the pattern (gemma3
            # convention; gemma2's alternate layout is pattern=2 shifted,
            # expressed via layer_types above).
            return [
                self.sliding_window
                if (l + 1) % self.sliding_window_pattern
                else full
                for l in range(self.num_layers)
            ]
        return [self.sliding_window] * self.num_layers

    # quantized-checkpoint metadata (from HF quantization_config)
    quant_group_size: int = 128

    @staticmethod
    def from_hf_dict(cfg: dict) -> "ModelConfig":
        arch = (cfg.get("architectures") or [None])[0]
        if arch is None:
            # some multimodal checkpoints keep architectures only in the
            # nested text_config; fall back to the top-level model_type
            arch = {
                "qwen2_5_vl": "Qwen2_5_VLForConditionalGeneration",
                "llava": "LlavaForConditionalGeneration",
            }.get(cfg.get("model_type"), "LlamaForCausalLM")
        if arch in ("LlavaForConditionalGeneration",
                    "LlavaLlamaForCausalLM"):
            # llava = llama/vicuna text tower + CLIP vision tower + 2-layer
            # projector (reference: srt/models/llava.py)
            text = dict(cfg["text_config"])
            text.setdefault("architectures", ["LlamaForCausalLM"])
            mc = ModelConfig.from_hf_dict(text)
            vc = dict(cfg["vision_config"])
            mc = dataclasses.replace(
                mc,
                architecture="LlavaForConditionalGeneration",
                image_token_id=cfg.get("image_token_index", 32000),
                vision={
                    "hidden_size": vc["hidden_size"],
                    "intermediate_size": vc["intermediate_size"],
                    "num_hidden_layers": vc["num_hidden_layers"],
                    "num_attention_heads": vc["num_attention_heads"],
                    "image_size": vc.get("image_size", 336),
                    "patch_size": vc.get("patch_size", 14),
                    "layer_norm_eps": vc.get("layer_norm_eps", 1e-5),
                    "hidden_act": vc.get("hidden_act", "quick_gelu"),
                    "image_mean": vc.get(
                        "image_mean", [0.48145466, 0.4578275, 0.40821073]
                    ),
                    "image_std": vc.get(
                        "image_std", [0.26862954, 0.26130258, 0.27577711]
                    ),
                    "vision_feature_layer": cfg.get("vision_feature_layer", -2),
                    "vision_feature_select_strategy": cfg.get(
                        "vision_feature_select_strategy", "default"
                    ),
                    "projector_hidden_act": cfg.get(
                        "projector_hidden_act", "gelu"
                    ),
                },
            )
            return mc
        if arch == "InternVLForConditionalGeneration":
            # InternViT tower + pixel shuffle + Qwen2/Llama trunk
            # (reference: srt/models/internvl.py; models/internvl.py here)
            text = dict(cfg["text_config"])
            tm = text.get("model_type", "qwen2")
            text["architectures"] = [
                "Qwen2ForCausalLM" if tm == "qwen2" else "LlamaForCausalLM"
            ]
            mc = ModelConfig.from_hf_dict(text)
            vc = dict(cfg["vision_config"])

            def one(x):
                return x[0] if isinstance(x, (list, tuple)) else x

            S = one(vc.get("image_size", 448))
            P = one(vc.get("patch_size", 14))
            ds = cfg.get("downsample_ratio", 0.5)
            vision = {
                "type": "internvl",
                "hidden_size": vc["hidden_size"],
                "num_hidden_layers": vc["num_hidden_layers"],
                "num_attention_heads": vc["num_attention_heads"],
                "intermediate_size": vc["intermediate_size"],
                "image_size": S,
                "patch_size": P,
                "layer_norm_eps": vc.get("layer_norm_eps", 1e-6),
                "attention_bias": bool(vc.get("attention_bias", False)),
                "use_qk_norm": bool(vc.get("use_qk_norm", False)),
                "downsample_ratio": ds,
                "num_image_tokens": int((S // P) ** 2 * ds * ds),
                "resize": "stretch",          # InternVL resizes to SxS
                "image_mean": [0.485, 0.456, 0.406],
                "image_std": [0.229, 0.224, 0.225],
            }
            return dataclasses.replace(
                mc,
                architecture=arch,
                vision=vision,
                image_token_id=cfg.get("image_token_id", 151667),
            )
        if arch == "Qwen2_5_VLForConditionalGeneration":
            # Qwen2.5-VL: Qwen2 text trunk (attention bias) + windowed ViT
            # + mrope (reference: srt/models/qwen2_5_vl.py; mrope positions
            # forward_batch_info.py:484). Old checkpoints keep text fields
            # flat; transformers >= 4.52 nests them under text_config.
            text = dict(cfg["text_config"]) if "text_config" in cfg else dict(cfg)
            text["architectures"] = ["Qwen2ForCausalLM"]
            text.pop("quantization_config", None)
            if not text.get("use_sliding_window", False):
                # qwen2 configs carry a sliding_window value that is OFF
                # unless use_sliding_window is set
                text.pop("sliding_window", None)
                text.pop("layer_types", None)
            mc = ModelConfig.from_hf_dict(text)
            vc = dict(cfg["vision_config"])
            rs = text.get("rope_scaling") or cfg.get("rope_scaling") or {}
            mrope = rs.get("mrope_section")
            vision = {
                "type": "qwen2_5_vl",
                "hidden_size": vc["hidden_size"],
                "depth": vc.get("depth", 32),
                "num_heads": vc.get("num_heads", 16),
                "intermediate_size": vc["intermediate_size"],
                "out_hidden_size": vc.get("out_hidden_size", mc.hidden_size),
                "patch_size": vc.get("patch_size", 14),
                "temporal_patch_size": vc.get("temporal_patch_size", 2),
                "spatial_merge_size": vc.get("spatial_merge_size", 2),
                "window_size": vc.get("window_size", 112),
                "fullatt_block_indexes": list(
                    vc.get("fullatt_block_indexes", [])
                ),
                "in_channels": vc.get("in_channels", 3),
                # dynamic-resolution bounds (HF Qwen2VLImageProcessor)
                "min_pixels": 56 * 56,
                "max_pixels": 12845056,
                "image_mean": [0.48145466, 0.4578275, 0.40821073],
                "image_std": [0.26862954, 0.26130258, 0.27577711],
                "image_size": 0,  # dynamic resolution — no fixed size
            }
            return dataclasses.replace(
                mc,
                architecture=arch,
                vision=vision,
                image_token_id=cfg.get("image_token_id", 151655),
                mrope_section=tuple(mrope) if mrope else None,
            )
        if arch == "Llama4ForConditionalGeneration":
            # multimodal wrapper: Scout/Maverick checkpoints keep the text
            # geometry (no_rope_layers, interleave_moe_layer_step, ...) in
            # a nested text_config — unwrap like the Gemma3 branch so the
            # text tower parses with real values (reference:
            # srt/models/mllama4.py serves the text tower the same way)
            text = dict(cfg["text_config"])
            text["architectures"] = ["Llama4ForCausalLM"]
            text.setdefault("vocab_size", cfg.get("vocab_size", 202048))
            mc = ModelConfig.from_hf_dict(text)
            return dataclasses.replace(
                mc, architecture="Llama4ForConditionalGeneration"
            )
        if arch == "Gemma3ForConditionalGeneration":
            # multimodal wrapper: serve the text tower (reference:
            # srt/models/gemma3_causal.py handles the text config likewise)
            text = dict(cfg["text_config"])
            text["architectures"] = ["Gemma3ForCausalLM"]
            text.setdefault("vocab_size", cfg.get("vocab_size", 262208))
            return ModelConfig.from_hf_dict(text)
        is_embedding = cfg.get("is_embedding", False)
        num_labels = 0
        if arch in (
            "LlamaForSequenceClassification",
            "Qwen2ForSequenceClassification",
            "Qwen2ForRewardModel",
            "InternLM2ForRewardModel",
        ):
            # Reward/classification: causal trunk + score head, served
            # through the pooled embedding path (models/classify.py).
            is_embedding = True
            # HF serializes the label count as id2label, not num_labels
            num_labels = (
                cfg.get("num_labels")
                or len(cfg.get("id2label") or ())
                or 1
            )
        if arch.endswith("Model"):
            # Bare-trunk embedding checkpoints (e5-mistral = MistralModel,
            # gte-qwen2 = Qwen2Model): serve the matching causal trunk with
            # pooled-hidden outputs; the loader ties the absent lm_head.
            arch = arch[: -len("Model")] + "ForCausalLM"
            is_embedding = True
        is_gemma = arch.startswith("Gemma")
        is_deepseek = arch.startswith("Deepseek")
        n_heads = cfg["num_attention_heads"]
        head_dim = cfg.get("head_dim") or cfg["hidden_size"] // n_heads
        if is_deepseek and cfg.get("kv_lora_rank"):
            # MLA: the attention head dim is qk_nope + qk_rope; the KV cache
            # holds one latent vector per token (num_kv_heads is moot).
            head_dim = (cfg.get("qk_nope_head_dim") or 0) + (
                cfg.get("qk_rope_head_dim") or 0
            )
        rope_scaling = cfg.get("rope_scaling")
        quantization = None
        group_size = 128
        qc = cfg.get("quantization_config")
        if qc:
            quantization = qc.get("quant_method")
            group_size = qc.get("group_size", 128)
            bits = qc.get("bits", qc.get("w_bit", 4))
            if quantization in ("awq", "gptq") and bits != 4:
                raise ValueError(f"{quantization} bits={bits} unsupported")
            if quantization == "compressed-tensors":
                # Validate the scheme eagerly (raises on group-strategy /
                # non-8-bit); loading resolves tensors per-proj.
                from sglang_custom_tpu.layers.quantization.compressed_tensors import (
                    parse_ct_scheme,
                )

                parse_ct_scheme(qc)
        return ModelConfig(
            architecture=arch,
            is_embedding=is_embedding,
            num_labels=num_labels,
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["hidden_size"],
            num_layers=cfg["num_hidden_layers"],
            num_q_heads=n_heads,
            num_kv_heads=cfg.get("num_key_value_heads", n_heads),
            head_dim=head_dim,
            intermediate_size=cfg["intermediate_size"],
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
            rope_theta=cfg.get("rope_theta", 10000.0),
            max_position_embeddings=cfg.get("max_position_embeddings", 4096),
            tie_word_embeddings=cfg.get("tie_word_embeddings", is_gemma),
            rope_scaling=rope_scaling,
            num_experts=cfg.get(
                "num_experts",
                cfg.get("num_local_experts", cfg.get("n_routed_experts", 0)),
            )
            or 0,
            num_experts_per_tok=cfg.get("num_experts_per_tok", 0) or 0,
            moe_intermediate_size=cfg.get("moe_intermediate_size", 0) or 0,
            attention_bias=cfg.get("attention_bias", False)
            or arch.startswith("Qwen2"),
            qk_norm=arch.startswith("Qwen3") or arch.startswith("Gemma3"),
            norm_topk_prob=cfg.get("norm_topk_prob", True),
            quantization=quantization,
            quant_group_size=group_size,
            sliding_window=cfg.get("sliding_window") or 0,
            layer_types=(
                tuple(cfg["layer_types"]) if cfg.get("layer_types") else None
            ),
            sliding_window_pattern=(
                cfg.get("sliding_window_pattern")
                or (2 if arch == "Gemma2ForCausalLM" else 0)
            ),
            attn_logit_softcap=cfg.get("attn_logit_softcapping") or 0.0,
            final_logit_softcap=cfg.get("final_logit_softcapping") or 0.0,
            query_pre_attn_scalar=cfg.get("query_pre_attn_scalar") or 0.0,
            hidden_act=(
                "gelu_tanh"
                if cfg.get(
                    "hidden_activation", cfg.get("hidden_act", "silu")
                )
                in ("gelu_pytorch_tanh", "gelu_tanh")
                else "silu"
            ),
            rope_local_theta=cfg.get("rope_local_base_freq") or 0.0,
            norm_zero_centered=is_gemma,
            scale_embedding=is_gemma,
            kv_lora_rank=cfg.get("kv_lora_rank") or 0,
            q_lora_rank=cfg.get("q_lora_rank") or 0,
            qk_nope_head_dim=cfg.get("qk_nope_head_dim") or 0,
            qk_rope_head_dim=cfg.get("qk_rope_head_dim") or 0,
            v_head_dim=cfg.get("v_head_dim") or 0,
            n_shared_experts=cfg.get("n_shared_experts") or 0,
            shared_expert_intermediate_size=cfg.get(
                "shared_expert_intermediate_size"
            ) or 0,
            first_k_dense_replace=cfg.get("first_k_dense_replace") or 0,
            routed_scaling_factor=cfg.get("routed_scaling_factor") or 1.0,
            topk_method=cfg.get("topk_method")
            or ("noaux_tc" if arch.startswith("DeepseekV3") else "greedy"),
            n_group=cfg.get("n_group") or 1,
            topk_group=cfg.get("topk_group") or 1,
            scoring_func=cfg.get("scoring_func")
            or ("sigmoid" if arch.startswith("DeepseekV3") else "softmax"),
            # v2's complex-pair rope is always interleaved; v3 ships a
            # rope_interleave flag (default True)
            rope_interleaved=bool(
                cfg.get("rope_interleave", is_deepseek or arch.startswith("Glm"))
            ),
            partial_rotary_factor=cfg.get("partial_rotary_factor") or 1.0,
            no_rope_layers=(
                tuple(cfg["no_rope_layers"]) if cfg.get("no_rope_layers")
                else None
            ),
            interleave_moe_layer_step=(
                cfg.get("interleave_moe_layer_step") or 0
            ) if arch.startswith("Llama4") else 0,
            intermediate_size_mlp=cfg.get("intermediate_size_mlp") or 0,
            attn_temperature_tuning=bool(
                cfg.get("attn_temperature_tuning", False)
            ),
            floor_scale=cfg.get("floor_scale") or 8192.0,
            attn_scale=cfg.get("attn_scale") or 0.1,
            use_qk_norm_l2=bool(cfg.get("use_qk_norm", False))
            and arch.startswith("Llama4"),
            attention_chunk_size=(
                cfg.get("attention_chunk_size") or 0
            ) if arch.startswith("Llama4") else 0,
        )

    @staticmethod
    def from_model_path(model_path: str) -> "ModelConfig":
        cfg_path = os.path.join(model_path, "config.json")
        if not os.path.exists(cfg_path):
            # GGUF checkpoints carry the geometry in their metadata
            # (model_loader/gguf_loader.py; reference: GGUFModelLoader
            # loader.py:1241)
            from sglang_custom_tpu.model_loader.gguf_loader import (
                config_from_gguf,
                gguf_path_of,
            )

            g = gguf_path_of(model_path)
            if g:
                return config_from_gguf(g)
        with open(cfg_path) as f:
            return ModelConfig.from_hf_dict(json.load(f))
