"""Process-level JAX runtime setup for the CLIs.

Enables the persistent compilation cache (remote TPU compiles cost tens of
seconds each; the sweep drivers rerun identical programs across processes) and
exposes the multi-host initialization hook.
"""

from __future__ import annotations

import os
from pathlib import Path

import jax

from gnn_pretraining_tpu import config


def setup_jax(cache_dir: Path | None = None) -> None:
    cache_dir = Path(cache_dir or (config.OUTPUT_DIR / ".jax_cache"))
    cache_dir.mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jaxlib without the knobs


def maybe_init_distributed() -> None:
    """Multi-host bring-up (SURVEY.md §5): call before first jax use when the
    standard cluster env vars are present; single-host runs skip silently."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
