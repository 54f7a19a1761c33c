"""Orbax-backed checkpointing for large-scale runs.

The default checkpoint module (lako_tpu.core.checkpoint) is flax-msgpack —
simple, single-host, good to t5-large scale. This adapter provides the same
best/latest semantics on Orbax for multi-host sharded arrays and async saves
(train step continues while the previous checkpoint flushes).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Tuple

def _checkpointer(use_async: bool):
    import orbax.checkpoint as ocp

    if use_async:
        return ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return ocp.StandardCheckpointer()


class OrbaxCheckpointManager:
    """Save/restore {params, opt_state} trees with step/metric metadata."""

    def __init__(self, dir_path: str, use_async: bool = True):
        self.root = Path(dir_path) / "checkpoint"
        self.root.mkdir(parents=True, exist_ok=True)
        self._ckptr = _checkpointer(use_async)

    def save(self, name: str, params: Any, opt_state: Any = None, step: int = 0,
             best_eval_metric: float = 0.0, force: bool = True) -> str:
        path = (self.root / name).resolve()
        tree = {"params": params}
        if opt_state is not None:
            tree["opt_state"] = opt_state
        self._ckptr.save(path / "state", tree, force=force)
        meta = {"step": int(step), "best_eval_metric": float(best_eval_metric)}
        (path / "meta.json").parent.mkdir(parents=True, exist_ok=True)
        (path / "meta.json").write_text(json.dumps(meta))
        latest = self.root / "latest_orbax"
        if latest.is_symlink():
            latest.unlink()
        latest.symlink_to(path)
        return str(path)

    def restore(self, name: str, params_template: Any,
                opt_state_template: Any = None) -> Tuple[Any, Any, dict]:
        path = (self.root / name).resolve()
        template = {"params": params_template}
        if opt_state_template is not None:
            template["opt_state"] = opt_state_template
        import orbax.checkpoint as ocp

        try:
            restored = self._ckptr.restore(
                path / "state", args=ocp.args.StandardRestore(template)
            )
        except TypeError:
            # StandardCheckpointer takes the target positionally
            restored = self._ckptr.restore(path / "state", template)
        meta = {}
        if (path / "meta.json").exists():
            meta = json.loads((path / "meta.json").read_text())
        return restored["params"], restored.get("opt_state"), meta

    def wait(self) -> None:
        """Block until pending async saves complete."""
        if hasattr(self._ckptr, "wait_until_finished"):
            self._ckptr.wait_until_finished()

    def close(self) -> None:
        self.wait()
        self._ckptr.close()
