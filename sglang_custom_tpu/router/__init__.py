"""Python launcher for the C++ router.

Analog of the reference's PyO3 bindings + launch scripts
(reference: sgl-router/py_src/sglang_router/launch_router.py,
launch_server.py — router + N local workers).
"""

from sglang_custom_tpu.router.launch_router import (
    RouterHandle,
    build_router,
    launch_router,
)

__all__ = ["RouterHandle", "build_router", "launch_router"]
