"""Preemption handling: checkpoint-and-requeue semantics.

The reference traps SLURM SIGUSR1 → ``scontrol requeue`` and ignores SIGTERM
(src/slurm.py:18-41). Here: a signal sets a flag; the train loop polls it at
step granularity, saves a ``latest`` checkpoint, runs an optional requeue
command, and exits cleanly. Works for SLURM (SIGUSR1), GKE/Borg-style SIGTERM,
and manual interruption.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
from typing import Callable, Optional

from lako_tpu.core.logging import get_logger

_PREEMPTED = False


def preempted() -> bool:
    return _PREEMPTED


def reset() -> None:
    global _PREEMPTED
    _PREEMPTED = False


def install_handlers(trap_sigterm: bool = False) -> None:
    """Install SIGUSR1 (and optionally SIGTERM) → preemption-flag handlers.
    By default SIGTERM is ignored like the reference (src/slurm.py:30-33)."""
    logger = get_logger()

    def _flag(signum, frame):
        global _PREEMPTED
        _PREEMPTED = True
        logger.warning("signal %s received: will checkpoint and exit", signum)

    signal.signal(signal.SIGUSR1, _flag)
    if trap_sigterm:
        signal.signal(signal.SIGTERM, _flag)
    else:
        signal.signal(signal.SIGTERM, signal.SIG_IGN)


def requeue_command() -> Optional[list]:
    """SLURM requeue (reference sig_handler, src/slurm.py:18-27) when running
    under SLURM as the main process."""
    job_id = os.environ.get("SLURM_JOB_ID")
    if job_id and os.environ.get("SLURM_PROCID", "0") == "0":
        return ["scontrol", "requeue", job_id]
    return None


def handle_preemption(save_fn: Callable[[], None], exit_code: int = 0) -> None:
    """Save, requeue if applicable, exit. Call when ``preempted()`` is True."""
    logger = get_logger()
    save_fn()
    cmd = requeue_command()
    if cmd:
        logger.warning("requeueing: %s", " ".join(cmd))
        try:
            subprocess.run(cmd, check=False)
        except FileNotFoundError:
            logger.warning("scontrol not available; skipping requeue")
    sys.exit(exit_code)
