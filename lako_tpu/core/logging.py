"""Process-aware logging (reference: src/util.py:24-54).

INFO on the main process, WARNING elsewhere; optional file handler; logs the launch
command line so runs are reproducible from the log alone.
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path
from typing import Optional


def init_logger(
    is_main: bool = True,
    filename: Optional[str] = None,
    name: str = "lako_tpu",
) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.handlers.clear()
    logger.setLevel(logging.INFO if is_main else logging.WARNING)
    fmt = logging.Formatter(
        "[%(asctime)s] {%(filename)s:%(lineno)d} %(levelname)s - %(message)s",
        "%m/%d %H:%M:%S",
    )
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if filename is not None and is_main:
        Path(filename).parent.mkdir(parents=True, exist_ok=True)
        fh = logging.FileHandler(filename)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    logger.propagate = False
    if is_main:
        logger.info("COMMAND: %s", " ".join(sys.argv))
    return logger


def get_logger(name: str = "lako_tpu") -> logging.Logger:
    return logging.getLogger(name)
