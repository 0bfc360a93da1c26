"""Sharded checkpoint save/restore (model_loader/sharded_state.py).

Reference analog: srt/model_loader/loader.py:654 ShardedStateLoader +
test of /save_sharded_model round trip.
"""

import numpy as np
import pytest

from sglang_custom_tpu.config.server_args import ServerArgs
from sglang_custom_tpu.entrypoints.engine import Engine


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    path = tmp_path_factory.mktemp("tiny_llama_shard")
    cfg = LlamaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    LlamaForCausalLM(cfg).to(torch.float32).save_pretrained(
        path, safe_serialization=True
    )
    return str(path)


SP = {"max_new_tokens": 10, "temperature": 0.0, "ignore_eos": True}


def test_sharded_roundtrip_serves_identically(ckpt, tmp_path):
    shard_dir = str(tmp_path / "sharded_ckpt")

    eng = Engine(
        server_args=ServerArgs(model_path=ckpt, dtype="float32",
                               device="cpu", page_size=16,
                               skip_tokenizer_init=True),
        num_pages=64,
    )
    base = eng.generate(input_ids=[1, 7, 23, 99], sampling_params=SP)
    res = eng.save_sharded_checkpoint(shard_dir)
    assert res["success"], res
    eng.shutdown()

    args = ServerArgs(model_path=shard_dir, dtype="float32", device="cpu",
                      page_size=16, skip_tokenizer_init=True,
                      load_format="sharded")
    # config.json lives in the HF dir — copy it next to the shards
    import shutil

    shutil.copy(f"{ckpt}/config.json", f"{shard_dir}/config.json")
    eng3 = Engine(server_args=args, num_pages=64)
    out = eng3.generate(input_ids=[1, 7, 23, 99], sampling_params=SP)
    eng3.check_memory()
    eng3.shutdown()
    assert out["output_ids"] == base["output_ids"]


def test_sharded_restore_under_tp_mesh(ckpt, tmp_path):
    """Restore places leaves with the model's TP shardings on the
    8-device CPU mesh (orbax reshards on read)."""
    import jax

    from sglang_custom_tpu.config.model_config import ModelConfig
    from sglang_custom_tpu.model_loader.loader import load_weights
    from sglang_custom_tpu.model_loader.sharded_state import (
        load_sharded_state,
        save_sharded_state,
    )
    from sglang_custom_tpu.parallel.mesh import create_mesh

    cfg = ModelConfig.from_model_path(ckpt)
    mesh1 = create_mesh(tp_size=1, dp_size=1)
    params = load_weights(ckpt, cfg, mesh1, dtype=jax.numpy.float32)
    shard_dir = str(tmp_path / "tp_ckpt")
    save_sharded_state(params, shard_dir)

    mesh2 = create_mesh(tp_size=2, dp_size=1)
    restored = load_sharded_state(shard_dir, cfg, mesh2, jax.numpy.float32)
    q1 = np.asarray(params["layers"]["q_proj"])
    q2 = np.asarray(restored["layers"]["q_proj"])
    np.testing.assert_array_equal(q1, q2)
    # and the restored leaf is actually sharded over the tensor axis
    sh = restored["layers"]["q_proj"].sharding
    assert getattr(sh, "spec", None) is not None
