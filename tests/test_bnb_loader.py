"""BitsAndBytes checkpoint loading (reference: loader.py:765
BitsAndBytesModelLoader). No bitsandbytes runtime exists here, so the test
quantizes a tiny llama to the serialized nf4 wire format itself and checks
the engine loads it and matches the float checkpoint's greedy outputs."""

import json

import numpy as np
import pytest
import torch

from sglang_custom_tpu.config.server_args import ServerArgs
from sglang_custom_tpu.entrypoints.engine import Engine

# bitsandbytes nf4 code table (functional.py create_normal_map)
NF4 = np.array([
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
    0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
    0.7229568362236023, 1.0,
], np.float32)

PROMPTS = [[1, 44, 7, 99, 3, 250], [9, 8, 7]]


def quantize_nf4(w: np.ndarray, bs: int = 64):
    """Forward nf4 quantizer producing the serialized tensor set."""
    flat = w.reshape(-1).astype(np.float32)
    n = flat.size
    pad = (-n) % bs
    flat = np.pad(flat, (0, pad))
    blocks = flat.reshape(-1, bs)
    absmax = np.abs(blocks).max(axis=1)
    normed = blocks / np.maximum(absmax, 1e-12)[:, None]
    idx = np.abs(normed[..., None] - NF4[None, None, :]).argmin(-1)
    nib = idx.reshape(-1).astype(np.uint8)
    if nib.size % 2:
        nib = np.pad(nib, (0, 1))
    packed = ((nib[0::2] << 4) | nib[1::2]).astype(np.uint8)
    state = {
        "blocksize": bs, "quant_type": "nf4",
        "shape": list(w.shape), "dtype": "bfloat16",
    }
    return {
        "": torch.from_numpy(packed.reshape(-1, 1)),
        ".absmax": torch.from_numpy(absmax),
        ".quant_map": torch.from_numpy(NF4.copy()),
        ".quant_state.bitsandbytes__nf4": torch.from_numpy(
            np.frombuffer(json.dumps(state).encode(), np.uint8).copy()
        ),
    }


@pytest.fixture(scope="module")
def ckpts(tmp_path_factory):
    """(float_dir, bnb_dir) for the same tiny llama."""
    from safetensors.torch import save_file
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, tie_word_embeddings=False,
    )
    torch.manual_seed(21)
    m = LlamaForCausalLM(cfg).to(torch.float32)
    fdir = tmp_path_factory.mktemp("tiny_float")
    m.save_pretrained(str(fdir), safe_serialization=True)

    bdir = tmp_path_factory.mktemp("tiny_bnb")
    tensors = {}
    for name, p in m.state_dict().items():
        w = p.numpy()
        is_linear = (
            name.endswith(".weight") and w.ndim == 2
            and "embed_tokens" not in name and "lm_head" not in name
        )
        if is_linear:
            for suf, t in quantize_nf4(w).items():
                tensors[name + suf] = t
        else:
            tensors[name] = p.contiguous()
    save_file(tensors, str(bdir / "model.safetensors"))
    conf = json.loads((fdir / "config.json").read_text())
    conf["quantization_config"] = {
        "quant_method": "bitsandbytes", "load_in_4bit": True,
        "bnb_4bit_quant_type": "nf4",
    }
    (bdir / "config.json").write_text(json.dumps(conf))
    return str(fdir), str(bdir)


def run_engine(path):
    eng = Engine(
        server_args=ServerArgs(
            model_path=path, dtype="float32", device="cpu", page_size=16,
            skip_tokenizer_init=True, context_length=128,
        ),
        num_pages=64,
    )
    outs = eng.generate(
        input_ids=PROMPTS,
        sampling_params={
            "max_new_tokens": 6, "temperature": 0.0, "ignore_eos": True,
        },
    )
    eng.shutdown()
    return [o["output_ids"] for o in outs]


def test_bnb_nf4_loads_and_serves(ckpts):
    fdir, bdir = ckpts
    # nf4 is lossy; greedy tokens on a tiny random model may legitimately
    # diverge, so assert the engine serves AND the dequantized weights are
    # close to the originals.
    from sglang_custom_tpu.model_loader.bnb_loader import BnbStateDict

    sd = BnbStateDict([bdir + "/model.safetensors"])
    import safetensors.numpy

    ref = {}
    from safetensors import safe_open

    with safe_open(fdir + "/model.safetensors", framework="pt") as st:
        for k in st.keys():
            ref[k] = st.get_tensor(k).float().numpy()
    checked = 0
    for k in ref:
        if k.endswith(".weight") and ref[k].ndim == 2 and (
            "embed" not in k and "lm_head" not in k
        ):
            got = sd.get_tensor(k).numpy()
            # loader must reproduce the quantizer's own dequant EXACTLY
            w = ref[k]
            flat = w.reshape(-1)
            blocks = flat.reshape(-1, 64)
            absmax = np.abs(blocks).max(axis=1)
            normed = blocks / np.maximum(absmax, 1e-12)[:, None]
            idx = np.abs(normed[..., None] - NF4[None, None, :]).argmin(-1)
            expect = (NF4[idx] * absmax[:, None]).reshape(w.shape)
            np.testing.assert_allclose(got, expect, rtol=1e-6, atol=1e-7)
            # and stay within nf4 noise of the original
            err = np.abs(got - w).max()
            scale = np.abs(w).max()
            assert err < 0.2 * scale + 1e-3, (k, err, scale)
            checked += 1
    assert checked >= 8

    out = run_engine(bdir)
    assert all(len(o) == 6 for o in out)


def test_bnb_double_quant_absmax():
    from sglang_custom_tpu.model_loader.bnb_loader import _dequant_absmax

    rng = np.random.RandomState(0)
    absmax = rng.uniform(0.5, 2.0, size=512).astype(np.float32)
    offset = float(absmax.mean())
    a = absmax - offset
    nested_map = np.linspace(-1, 1, 256).astype(np.float32)
    nested_absmax = np.empty(2, np.float32)
    q = np.empty(512, np.uint8)
    for b in range(2):
        blk = a[b * 256:(b + 1) * 256]
        nested_absmax[b] = np.abs(blk).max()
        q[b * 256:(b + 1) * 256] = np.abs(
            blk[:, None] / nested_absmax[b] - nested_map[None, :]
        ).argmin(-1)
    raw = {
        "w.absmax": q,
        "w.nested_quant_map": nested_map,
        "w.nested_absmax": nested_absmax,
    }
    state = {"nested_blocksize": 256, "nested_offset": offset}
    got = _dequant_absmax(raw, "w", state)
    assert np.abs(got - absmax).max() < 0.02
