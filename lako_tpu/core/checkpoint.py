"""Checkpointing with best-metric / latest semantics.

Mirrors the reference policy (src/util.py:105-146, train_reader.py:99-114): save
under ``<dir>/checkpoint/<name>/`` with optimizer state + step + best metric, and
force-refresh a ``latest`` symlink. Serialization is flax msgpack (framework
pytrees, no pickle of live objects).
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Optional, Tuple

import jax
from flax import serialization


def _symlink_force(target: str, link: str) -> None:
    try:
        os.symlink(target, link)
    except FileExistsError:
        os.remove(link)
        os.symlink(target, link)


def save_checkpoint(
    dir_path: str,
    name: str,
    params: Any,
    opt_state: Any = None,
    step: int = 0,
    best_eval_metric: float = 0.0,
    extra: Optional[dict] = None,
) -> str:
    path = Path(dir_path) / "checkpoint" / name
    path.mkdir(parents=True, exist_ok=True)
    params = jax.device_get(params)
    (path / "params.msgpack").write_bytes(serialization.to_bytes(params))
    if opt_state is not None:
        (path / "opt_state.msgpack").write_bytes(
            serialization.to_bytes(jax.device_get(opt_state))
        )
    meta = {"step": int(step), "best_eval_metric": float(best_eval_metric)}
    if extra:
        meta.update(extra)
    (path / "meta.json").write_text(json.dumps(meta, indent=2))
    _symlink_force(str(path), str(Path(dir_path) / "checkpoint" / "latest"))
    return str(path)


def load_checkpoint(
    path: str,
    params_template: Any,
    opt_state_template: Any = None,
) -> Tuple[Any, Any, dict]:
    """Restore (params, opt_state|None, meta) using templates for tree structure."""
    p = Path(path)
    if p.name != "latest" and not (p / "params.msgpack").exists() and (p / "checkpoint").exists():
        p = p / "checkpoint" / "latest"
    params = serialization.from_bytes(params_template, (p / "params.msgpack").read_bytes())
    opt_state = None
    if opt_state_template is not None and (p / "opt_state.msgpack").exists():
        opt_state = serialization.from_bytes(
            opt_state_template, (p / "opt_state.msgpack").read_bytes()
        )
    meta = json.loads((p / "meta.json").read_text()) if (p / "meta.json").exists() else {}
    return params, opt_state, meta
