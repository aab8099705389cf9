"""Fidelity-aware run completion markers.

The reference's sweep drivers account per-subprocess exit codes
(run_pretrain.py:60-79) so a crashed cell is re-run. Round 1 of this build
used bare ``<run>.summary.json`` existence as the completion marker, which
could not distinguish a 2-epoch smoke test on 1/10-scale stand-in data from a
50-epoch production run. Every summary now embeds a ``fidelity/*`` block
(epochs requested, data provenance, completion flag) and ``--resume`` skips a
cell only when that block matches the currently requested fidelity.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional, Sequence

from gnn_pretraining_tpu import config


def data_fidelity(processed_dir: Optional[Path],
                  domains: Sequence[str]) -> Dict[str, object]:
    """Provenance of the processed datasets a run will read.

    Reads the ``meta__source``/``meta__scale`` entries data/setup.py records
    in each .npz. Files written before provenance existed report "unknown".
    """
    import numpy as np

    processed_dir = Path(processed_dir or config.PROCESSED_DIR)
    sources, scales, homs = set(), set(), set()
    for d in domains:
        path = processed_dir / f"{d}.npz"
        try:
            with np.load(path, allow_pickle=False) as z:
                sources.add(str(z["meta__source"]) if "meta__source" in z.files
                            else "unknown")
                scales.add(float(z["meta__scale"]) if "meta__scale" in z.files
                           else -1.0)
                homs.add(float(z["meta__homophily"])
                         if "meta__homophily" in z.files else 0.0)
        except FileNotFoundError:
            sources.add("missing")
            scales.add(-1.0)
            homs.add(-1.0)
    source = sources.pop() if len(sources) == 1 else "mixed"
    scale = scales.pop() if len(scales) == 1 else -1.0
    # Feature-calibration provenance (nfm_probe.md): iid (0.0) vs
    # neighbor-correlated (>0) synthetic TU features produce different
    # pretraining outcomes, so a marker from one calibration must never
    # satisfy --resume under the other. Planetoid stores carry no homophily
    # (the generator never smooths them) and report 0.0.
    hom = homs.pop() if len(homs) == 1 else -1.0
    return {"data_source": source, "synthetic_scale": scale,
            "calibration": hom}


def fidelity_block(epochs: int, seed: int, aggregation: str,
                   processed_dir: Optional[Path],
                   domains: Sequence[str]) -> Dict[str, object]:
    """The ``fidelity/*`` entries merged into a run's summary at finish()."""
    d = data_fidelity(processed_dir, domains)
    return {
        "fidelity/epochs": int(epochs),
        "fidelity/seed": int(seed),
        "fidelity/aggregation": aggregation,
        "fidelity/data_source": d["data_source"],
        "fidelity/synthetic_scale": d["synthetic_scale"],
        "fidelity/calibration": d["calibration"],
        "fidelity/completed": 1,
    }


def cell_completed(summary_path: Path, expected: Dict[str, object]) -> bool:
    """True iff the summary exists, completed, and matches ``expected``
    (same keys as ``fidelity_block``; compare epochs/source/scale/aggregation).

    Summaries without a fidelity block (pre-round-2 runs, or test pollution)
    never count as complete.
    """
    if not summary_path.exists():
        return False
    try:
        with open(summary_path) as f:
            s = json.load(f)
    except (OSError, json.JSONDecodeError):
        return False
    if not s.get("fidelity/completed"):
        return False
    for k in ("fidelity/epochs", "fidelity/aggregation",
              "fidelity/data_source", "fidelity/synthetic_scale",
              "fidelity/calibration"):
        if s.get(k) != expected.get(k):
            return False
    return True
