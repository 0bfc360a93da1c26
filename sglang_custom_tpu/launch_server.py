"""CLI server launcher: ``python -m sglang_custom_tpu.launch_server``.

Reference analog: python/sglang/launch_server.py:1-16.
"""

import argparse

from sglang_custom_tpu.config.server_args import ServerArgs
from sglang_custom_tpu.entrypoints.http_server import launch_server

if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="sglang_custom_tpu server")
    ServerArgs.add_cli_args(parser)
    args = parser.parse_args()
    launch_server(ServerArgs.from_cli_args(args))
