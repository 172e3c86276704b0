"""Optional experiment logging (wandb when installed, no-op otherwise).

The reference wires wandb into every entry point with a disable flag
(reference: coolchic/encode.py:148-154, enc/training/train.py:337,
hypernet/training.py:247-255). Here wandb is optional: if the package is
missing or logging is disabled, every call is a silent no-op.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

_run = None
_disabled = False


def init(project: str = "coolchic-tpu-runs", config: Optional[Dict] = None,
         disable: bool = False, **kwargs) -> None:
    """Start a run. ``disable=True`` (or wandb not installed) makes all
    subsequent log() calls no-ops (reference: encode.py:148-152 sets
    WANDB_MODE=disabled)."""
    global _run, _disabled
    _disabled = disable
    if disable:
        os.environ["WANDB_MODE"] = "disabled"
        return
    try:
        import wandb

        _run = wandb.init(project=project, config=config or {}, **kwargs)
    except Exception:
        _disabled = True


def log(metrics: Dict[str, Any], step: Optional[int] = None) -> None:
    if _disabled or _run is None:
        return
    try:
        _run.log(metrics, step=step)
    except Exception:
        pass


def finish() -> None:
    global _run
    if _run is not None:
        try:
            _run.finish()
        except Exception:
            pass
        _run = None


def mem_info(prefix: str = "Memory allocated") -> str:
    """CPU RSS + per-device TPU memory report
    (reference: enc/utils/misc.py:274-293)."""
    lines = []
    try:
        import psutil

        rss = psutil.Process().memory_info().rss / 2**30
        lines.append(f"{prefix}: cpu {rss:.3f} GiB")
    except Exception:
        pass
    try:
        import jax

        for d in jax.local_devices():
            stats = d.memory_stats() or {}
            used = stats.get("bytes_in_use", 0) / 2**30
            lines.append(f"{prefix}: {d} {used:.3f} GiB")
    except Exception:
        pass
    return "\n".join(lines)
