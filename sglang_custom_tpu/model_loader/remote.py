"""Remote model sources: fetch a checkpoint to a local cache dir.

Capability analog of the reference's RemoteModelLoader + connectors
(reference: srt/model_loader/loader.py:1346 RemoteModelLoader,
srt/connector/ redis/s3 connectors). This environment has zero egress,
so the connectors are the protocol-level ones a private serving fleet
actually uses on its own network:

- ``file://<dir>``        — local path (returned as-is)
- ``http(s)://...tar[.gz]`` — archive download + extract
- ``http(s)://<base>/``   — directory with a ``manifest.json``
  (``{"files": ["config.json", "model.safetensors", ...]}``) fetched
  file-by-file

Downloads cache under ``~/.cache/sglang_custom_tpu/models/<sha1(url)>``
and are reused when complete (a ``.complete`` marker commits the fetch).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import tarfile
import urllib.parse
import urllib.request

from sglang_custom_tpu.utils import get_logger

logger = get_logger(__name__)

CACHE_ROOT = os.path.expanduser("~/.cache/sglang_custom_tpu/models")


def is_remote(model_path: str) -> bool:
    scheme = urllib.parse.urlparse(model_path).scheme
    return scheme in ("file", "http", "https")


def fetch_model(url: str, cache_dir: str = None) -> str:
    """Resolve a remote model URL to a local directory path."""
    parsed = urllib.parse.urlparse(url)
    if parsed.scheme == "file":
        path = urllib.request.url2pathname(parsed.path)
        if not os.path.isdir(path) and not os.path.isfile(path):
            raise FileNotFoundError(path)
        return path
    if parsed.scheme not in ("http", "https"):
        raise ValueError(f"unsupported model url scheme: {url!r}")

    root = cache_dir or CACHE_ROOT
    key = hashlib.sha1(url.encode()).hexdigest()[:16]
    dst = os.path.join(root, key)
    marker = os.path.join(dst, ".complete")
    if os.path.exists(marker):
        logger.info("remote model cache hit: %s -> %s", url, dst)
        return dst
    if os.path.isdir(dst):
        shutil.rmtree(dst)  # partial fetch: restart
    os.makedirs(dst, exist_ok=True)

    if url.endswith((".tar", ".tar.gz", ".tgz")):
        arc = os.path.join(dst, "_archive")
        urllib.request.urlretrieve(url, arc)
        with tarfile.open(arc) as tf:
            tf.extractall(dst, filter="data")
        os.remove(arc)
        # archives often wrap one directory; flatten it
        entries = [e for e in os.listdir(dst) if not e.startswith(".")]
        if len(entries) == 1 and os.path.isdir(
            os.path.join(dst, entries[0])
        ):
            inner = os.path.join(dst, entries[0])
            for e in os.listdir(inner):
                shutil.move(os.path.join(inner, e), dst)
            os.rmdir(inner)
    else:
        base = url if url.endswith("/") else url + "/"
        with urllib.request.urlopen(base + "manifest.json") as r:
            manifest = json.load(r)
        files = manifest.get("files")
        if not files:
            raise ValueError(f"{url}: manifest.json has no 'files'")
        for f in files:
            if "/" in f or f.startswith("."):
                raise ValueError(f"manifest path {f!r} not allowed")
            logger.info("fetching %s", f)
            urllib.request.urlretrieve(base + f, os.path.join(dst, f))

    with open(marker, "w") as f:
        f.write(url)
    logger.info("remote model fetched: %s -> %s", url, dst)
    return dst
