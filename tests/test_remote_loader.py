"""Remote model fetching (model_loader/remote.py; reference:
RemoteModelLoader loader.py:1346 + srt/connector/)."""

import json
import os
import tarfile
import threading

import pytest


@pytest.fixture(scope="module")
def http_root(tiny_llama_path, tmp_path_factory):
    """Serve the tiny checkpoint over a local http server: a manifest
    directory AND a tar archive."""
    import http.server
    import shutil

    root = tmp_path_factory.mktemp("httproot")
    mdir = root / "model"
    shutil.copytree(tiny_llama_path, mdir)
    files = [f for f in os.listdir(mdir) if not f.startswith(".")]
    with open(mdir / "manifest.json", "w") as f:
        json.dump({"files": files}, f)
    with tarfile.open(root / "model.tar", "w") as tf:
        tf.add(mdir, arcname="model")

    httpd = http.server.ThreadingHTTPServer(
        ("127.0.0.1", 0),
        lambda *a, **k: http.server.SimpleHTTPRequestHandler(
            *a, directory=str(root), **k
        ),
    )
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def test_fetch_manifest_and_tar(http_root, tmp_path):
    from sglang_custom_tpu.model_loader.remote import fetch_model

    d1 = fetch_model(http_root + "/model/", cache_dir=str(tmp_path))
    assert os.path.exists(os.path.join(d1, "config.json"))
    # cache hit returns the same dir
    assert fetch_model(http_root + "/model/", cache_dir=str(tmp_path)) == d1

    d2 = fetch_model(http_root + "/model.tar", cache_dir=str(tmp_path))
    assert os.path.exists(os.path.join(d2, "config.json"))
    assert d2 != d1


def test_engine_serves_remote_model(http_root, tmp_path, monkeypatch):
    import sglang_custom_tpu.model_loader.remote as remote

    monkeypatch.setattr(remote, "CACHE_ROOT", str(tmp_path / "cache"))
    from sglang_custom_tpu.config.server_args import ServerArgs
    from sglang_custom_tpu.entrypoints.engine import Engine

    eng = Engine(server_args=ServerArgs(
        model_path=http_root + "/model/", page_size=16,
        skip_tokenizer_init=True, context_length=256, dtype="float32",
        attention_backend="xla",
    ), num_pages=128)
    try:
        out = eng.generate(input_ids=[1, 5, 9], sampling_params={
            "max_new_tokens": 4, "temperature": 0.0, "ignore_eos": True,
        })
        assert len(out["output_ids"]) == 4
    finally:
        eng.shutdown()
