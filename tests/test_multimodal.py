"""Vision-language (LLaVA) serving tests vs HF golden (CPU).

Reference analog: test/srt/test_vision_openai_server*.py + the HFRunner
golden-compare strategy — a tiny LlavaForConditionalGeneration checkpoint
run through HF transformers and through our engine must produce identical
greedy tokens, and the vision tower features must match numerically.
"""

import numpy as np
import pytest

from sglang_custom_tpu.config.model_config import ModelConfig
from sglang_custom_tpu.config.server_args import ServerArgs
from sglang_custom_tpu.entrypoints.engine import Engine

IMG_TOKEN = 500  # within the tiny vocab


@pytest.fixture(scope="module")
def llava_ckpt(tmp_path_factory):
    import torch
    from transformers import (
        CLIPVisionConfig,
        LlamaConfig,
        LlavaConfig,
        LlavaForConditionalGeneration,
    )

    path = tmp_path_factory.mktemp("tiny_llava")
    vision = CLIPVisionConfig(
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        image_size=24,
        patch_size=8,
        projection_dim=32,
    )
    text = LlamaConfig(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=512,
        tie_word_embeddings=False,
    )
    cfg = LlavaConfig(
        vision_config=vision, text_config=text, image_token_index=IMG_TOKEN
    )
    torch.manual_seed(0)
    m = LlavaForConditionalGeneration(cfg).float()
    m.save_pretrained(path, safe_serialization=True)
    return str(path)


@pytest.fixture(scope="module")
def hf_llava(llava_ckpt):
    import torch
    from transformers import LlavaForConditionalGeneration

    m = LlavaForConditionalGeneration.from_pretrained(
        llava_ckpt, torch_dtype=torch.float32
    )
    m.eval()
    return m


@pytest.fixture(scope="module")
def engine(llava_ckpt):
    args = ServerArgs(
        model_path=llava_ckpt,
        dtype="float32",
        kv_cache_dtype="float32",
        device="cpu",
        page_size=4,
        skip_tokenizer_init=True,
        context_length=256,
        schedule_policy="fcfs",
    )
    return Engine(server_args=args, num_pages=256)


def _pixels(seed, n=1):
    """Pre-normalized pixel_values [n, 3, 24, 24] (bypasses PIL resize so
    HF and our engine see bit-identical inputs)."""
    rng = np.random.RandomState(seed)
    return rng.randn(n, 3, 24, 24).astype(np.float32)


def test_config_parses_llava(llava_ckpt):
    mc = ModelConfig.from_model_path(llava_ckpt)
    assert mc.is_multimodal
    assert mc.image_token_id == IMG_TOKEN
    assert mc.num_image_tokens == 9  # (24/8)^2, CLS dropped


def test_vision_features_match_hf(engine, hf_llava):
    import torch

    px = _pixels(0)
    ours = engine.runner.encode_images(px)[0]  # [9, H]
    with torch.no_grad():
        theirs = hf_llava.get_image_features(
            pixel_values=torch.tensor(px),
            vision_feature_layer=-2,
            vision_feature_select_strategy="default",
        )
    theirs = np.asarray(theirs[0] if isinstance(theirs, (list, tuple)) else theirs)
    theirs = theirs.reshape(ours.shape)
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def hf_greedy_mm(hf_llava, expanded_ids, px, n):
    import torch

    with torch.no_grad():
        out = hf_llava.generate(
            input_ids=torch.tensor([expanded_ids]),
            pixel_values=torch.tensor(px),
            max_new_tokens=n,
            do_sample=False,
            pad_token_id=0,
            eos_token_id=None,
        )
    return out[0, len(expanded_ids):].tolist()


def test_generate_with_image_matches_hf(engine, hf_llava):
    px = _pixels(1)
    prompt = [1, 7, 9, IMG_TOKEN, 42, 17]
    out = engine.generate(
        input_ids=prompt,
        sampling_params={
            "max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True,
        },
        image_data=px[0],
    )
    # HF wants the placeholder pre-expanded to num_image_tokens copies.
    expanded = [1, 7, 9] + [IMG_TOKEN] * 9 + [42, 17]
    golden = hf_greedy_mm(hf_llava, expanded, px, 8)
    assert out["output_ids"] == golden
    engine.check_memory()


def test_two_images_one_prompt(engine, hf_llava):
    px = _pixels(2, n=2)
    prompt = [1, IMG_TOKEN, 5, IMG_TOKEN, 9]
    out = engine.generate(
        input_ids=prompt,
        sampling_params={
            "max_new_tokens": 6, "temperature": 0.0, "ignore_eos": True,
        },
        image_data=[px[0], px[1]],
    )
    expanded = [1] + [IMG_TOKEN] * 9 + [5] + [IMG_TOKEN] * 9 + [9]
    golden = hf_greedy_mm(hf_llava, expanded, px, 6)
    assert out["output_ids"] == golden
    engine.check_memory()


def test_image_prefix_cache_keys_on_content(engine):
    """Same image twice -> radix hit; different image -> no false reuse."""
    px_a = _pixels(3)
    px_b = _pixels(4)
    prompt = [2, 3, 4, IMG_TOKEN, 11, 12]
    sp = {"max_new_tokens": 4, "temperature": 0.0, "ignore_eos": True}
    o1 = engine.generate(input_ids=prompt, sampling_params=sp, image_data=px_a[0])
    o2 = engine.generate(input_ids=prompt, sampling_params=sp, image_data=px_a[0])
    o3 = engine.generate(input_ids=prompt, sampling_params=sp, image_data=px_b[0])
    assert o2["meta_info"]["cached_tokens"] > 0
    assert o2["output_ids"] == o1["output_ids"]
    # different image content must not be served from the first image's KV
    assert o3["meta_info"]["cached_tokens"] <= 3
    assert o3["output_ids"] != o1["output_ids"] or True  # may coincide; key check is cached_tokens
    engine.check_memory()


def test_chunked_prefill_with_image(llava_ckpt, hf_llava):
    """Image span crossing chunk boundaries must inject correctly."""
    args = ServerArgs(
        model_path=llava_ckpt,
        dtype="float32",
        kv_cache_dtype="float32",
        device="cpu",
        page_size=4,
        skip_tokenizer_init=True,
        context_length=256,
        chunked_prefill_size=5,
    )
    eng = Engine(server_args=args, num_pages=256)
    px = _pixels(5)
    prompt = [1, 7, 9, IMG_TOKEN, 42, 17, 8, 3]
    out = eng.generate(
        input_ids=prompt,
        sampling_params={
            "max_new_tokens": 6, "temperature": 0.0, "ignore_eos": True,
        },
        image_data=px[0],
    )
    expanded = [1, 7, 9] + [IMG_TOKEN] * 9 + [42, 17, 8, 3]
    golden = hf_greedy_mm(hf_llava, expanded, px, 6)
    assert out["output_ids"] == golden
    eng.check_memory()
    eng.shutdown()


def test_mm_cache_hit(engine):
    """Second use of the same image skips the vision tower (cache hit)."""
    px = _pixels(6)
    n0 = len(engine.mm_cache)
    sp = {"max_new_tokens": 2, "temperature": 0.0, "ignore_eos": True}
    engine.generate(input_ids=[9, IMG_TOKEN, 4], sampling_params=sp,
                    image_data=px[0])
    assert len(engine.mm_cache) == n0 + 1
    engine.generate(input_ids=[8, IMG_TOKEN, 4], sampling_params=sp,
                    image_data=px[0])
    assert len(engine.mm_cache) == n0 + 1
