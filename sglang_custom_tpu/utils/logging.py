"""Logging setup (reference analog: srt/utils.py configure_logger)."""

import logging
import sys

_FORMAT = "[%(asctime)s %(name)s %(levelname)s] %(message)s"


def configure_logger(level: str = "info") -> None:
    logging.basicConfig(
        level=getattr(logging, level.upper(), logging.INFO),
        format=_FORMAT,
        datefmt="%H:%M:%S",
        stream=sys.stdout,
        force=True,
    )


def get_logger(name: str) -> logging.Logger:
    return logging.getLogger(name)
