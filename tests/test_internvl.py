"""InternVL golden tests vs HuggingFace (CPU, fp32).

Covers the InternViT tower (layer scales, CLS+abs pos, LN blocks), pixel
shuffle, projector, and end-to-end greedy image generation through the
Engine. Reference: srt/models/internvl.py.
"""

import numpy as np
import pytest
import torch

from sglang_custom_tpu.config.model_config import ModelConfig
from sglang_custom_tpu.config.server_args import ServerArgs

VOCAB = 512
IMG_TOK = 500


def tiny_cfg():
    from transformers import InternVLConfig

    return InternVLConfig(
        text_config=dict(
            model_type="qwen2", vocab_size=VOCAB, hidden_size=64,
            intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            rms_norm_eps=1e-6, rope_theta=10000.0,
            max_position_embeddings=512, tie_word_embeddings=False,
        ),
        vision_config=dict(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=64, image_size=[56, 56],
            patch_size=[14, 14], layer_norm_eps=1e-6,
            use_absolute_position_embeddings=True, use_qk_norm=True,
            attention_bias=True, use_mean_pooling=True,
            hidden_dropout_prob=0.0, attention_dropout=0.0,
            projection_dropout=0.0, layer_scale_init_value=0.1,
            norm_type="layer_norm",
        ),
        image_token_id=IMG_TOK,
        downsample_ratio=0.5,
        vision_feature_layer=-1,
        vision_feature_select_strategy="default",
        projector_hidden_act="gelu",
    )


@pytest.fixture(scope="module")
def hf_model(tmp_path_factory):
    from transformers import InternVLForConditionalGeneration

    torch.manual_seed(0)
    m = InternVLForConditionalGeneration(tiny_cfg()).to(
        torch.float32
    ).eval()
    path = str(tmp_path_factory.mktemp("internvl"))
    m.save_pretrained(path, safe_serialization=True)
    return m, path


def test_config_parse(hf_model):
    _, path = hf_model
    cfg = ModelConfig.from_model_path(path)
    assert cfg.architecture == "InternVLForConditionalGeneration"
    assert cfg.vision["type"] == "internvl"
    assert cfg.vision["use_qk_norm"] and cfg.vision["attention_bias"]
    # 56/14 = 4x4 patches, 0.5 shuffle -> 4 tokens
    assert cfg.num_image_tokens == 4
    assert cfg.attention_bias  # qwen2 trunk


def test_vision_matches_hf(hf_model):
    from sglang_custom_tpu.model_executor.model_runner import ModelRunner
    from sglang_custom_tpu.model_loader.loader import load_weights
    from sglang_custom_tpu.parallel.mesh import create_mesh

    import jax.numpy as jnp

    model, path = hf_model
    cfg = ModelConfig.from_model_path(path)
    args = ServerArgs(model_path=path, page_size=16,
                      skip_tokenizer_init=True, context_length=512,
                      dtype="float32", attention_backend="xla")
    mesh = create_mesh(tp_size=1, dp_size=1)
    params = load_weights(path, cfg, mesh, dtype=jnp.float32)
    runner = ModelRunner(args, cfg, params, mesh, num_pages=64)

    rng = np.random.RandomState(3)
    px = rng.randn(2, 3, 56, 56).astype(np.float32)
    mine = runner.encode_images(px)

    with torch.no_grad():
        hf = model.model.get_image_features(torch.tensor(px)).numpy()
    assert mine.shape == hf.shape
    np.testing.assert_allclose(mine, hf, rtol=2e-3, atol=2e-3)


def test_generate_with_image_matches_hf(hf_model):
    from sglang_custom_tpu.entrypoints.engine import Engine

    model, path = hf_model
    eng = Engine(server_args=ServerArgs(
        model_path=path, page_size=16, skip_tokenizer_init=True,
        context_length=512, dtype="float32", attention_backend="xla",
    ), num_pages=256)
    try:
        rng = np.random.RandomState(11)
        img = rng.randint(0, 256, (56, 56, 3), dtype=np.uint8)
        prompt = [3, 4, IMG_TOK, 7, 8, 9]
        out = eng.generate(
            input_ids=prompt,
            sampling_params={"max_new_tokens": 6, "temperature": 0.0,
                             "ignore_eos": True},
            image_data=img,
        )
        # HF comparison with the same normalized pixels
        from sglang_custom_tpu.multimodal import create_processor

        cfg = ModelConfig.from_model_path(path)
        px, _ = create_processor(cfg).preprocess(img)
        hf_ids = [3, 4] + [IMG_TOK] * 4 + [7, 8, 9]
        with torch.no_grad():
            gen = model.generate(
                torch.tensor([hf_ids]),
                pixel_values=torch.tensor(px[None]),
                max_new_tokens=6, do_sample=False,
            )
        hf_out = gen[0, len(hf_ids):].tolist()
        assert out["output_ids"] == hf_out
    finally:
        eng.shutdown()
