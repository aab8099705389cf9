"""Metric sink: local JSONL (source of truth) with optional wandb mirroring.

The reference logs everything to wandb (pretrain.py:190, finetune.py:339) and
its analysis layer consumes the ``test/*`` summary namespace via the wandb API
(analysis/data_collection.py:60-113). Here the same metric namespaces are
written to ``outputs/metrics/<project>/<run>.jsonl``; the analysis layer reads
those files. If wandb is importable and ``WANDB_MODE`` is not disabled, logs
are mirrored there too.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path
from typing import Dict, Optional

from gnn_pretraining_tpu import config


def _to_float(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return v


def record_pretrain_timing(run_name: str, seconds: float) -> None:
    """Merge one pretrain cell's wall time into the tracked
    ``analysis/results/pretrain_timings.json``.

    ``outputs/`` (checkpoints, metric JSONLs, sweep logs) is gitignored and
    dies with the container; the fine-tune grid survives through the tracked
    results CSV (``training_time`` column, reference
    analysis/data_collection.py:85-113) but pretrain timings had no durable
    home, so each container reset destroyed the wall-clock evidence for the
    24-cell pretrain grid. Same merge discipline as the CSV: per-cell,
    latest run wins, atomic replace."""
    path = config.REPO_ROOT / "analysis" / "results" / "pretrain_timings.json"
    timings: Dict[str, float] = {}
    if path.exists():
        try:
            timings = json.loads(path.read_text())
        except (json.JSONDecodeError, OSError):
            timings = {}
    timings[run_name] = round(float(seconds), 1)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_name(path.name + ".tmp")
    tmp.write_text(json.dumps(dict(sorted(timings.items())), indent=2) + "\n")
    os.replace(tmp, path)


class MetricLogger:
    def __init__(self, project: str, run_name: str,
                 out_dir: Optional[Path] = None, use_wandb: bool = True):
        self.project = project
        self.run_name = run_name
        out_dir = Path(out_dir or config.METRICS_DIR) / project
        out_dir.mkdir(parents=True, exist_ok=True)
        self.path = out_dir / f"{run_name}.jsonl"
        self._fh = open(self.path, "a", buffering=1)
        self._summary: Dict[str, float] = {}
        self._wandb = None
        if use_wandb and os.environ.get("WANDB_MODE", "") not in ("disabled", "offline"):
            try:
                import wandb  # type: ignore

                self._wandb = wandb
                wandb.init(project=project, name=run_name)
            except Exception:
                self._wandb = None

    def log(self, metrics: Dict[str, float], step: int) -> None:
        row = {k: _to_float(v) for k, v in metrics.items()}
        row["_step"] = int(step)
        row["_time"] = time.time()
        self._fh.write(json.dumps(row) + "\n")
        self._summary.update({k: v for k, v in row.items()
                              if not k.startswith("_")})
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def finish(self, extra: Optional[Dict] = None) -> None:
        """Write the summary; ``extra`` (e.g. the ``fidelity/*`` block from
        utils/fidelity.py) is merged in so completion markers carry run
        provenance."""
        if extra:
            self._summary.update(extra)
        summary_path = self.path.with_suffix(".summary.json")
        # Atomic replace: a kill mid-write must not truncate an existing
        # completion marker (cell_completed tolerates corrupt JSON, but the
        # previously recorded completion would still be lost).
        tmp = summary_path.with_name(summary_path.name + ".tmp")
        with open(tmp, "w") as f:
            json.dump(self._summary, f, indent=2)
        os.replace(tmp, summary_path)
        self._fh.close()
        if self._wandb is not None:
            self._wandb.finish()
