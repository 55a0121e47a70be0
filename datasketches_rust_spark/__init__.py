"""PySpark-native near-duplicate detection + mergeable-sketch analytics.

Public API surface (see SURVEY.md §2 for the operator inventory and
README.md for the module map)."""

from .config import DedupConfig, MinHashConfig, SimHashConfig, ThetaConfig
from .session import (
    ENGINE_CONF,
    apply_engine_conf,
    ensure_min_partitions,
    make_local_session,
)

__all__ = [
    "DedupConfig",
    "MinHashConfig",
    "SimHashConfig",
    "ThetaConfig",
    "ENGINE_CONF",
    "apply_engine_conf",
    "ensure_min_partitions",
    "make_local_session",
]
