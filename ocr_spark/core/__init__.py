"""Pure-Python extraction core — the single source of truth.

Every function here is pure and deterministic: ``str -> value`` with no
wall-clock, no randomness, no mutable module state. The same code path is
executed by the single-process oracle (tests) and by the Arrow-batch
pandas UDFs (cluster), so per-turn output equality between the two is by
construction; the pytest gate verifies the *distributed orchestration*
preserves it (partitioning, salting, batch boundaries must not leak into
results).
"""

from ocr_spark.core.extract import ExtractResult, extract_turn
from ocr_spark.core.sniff import sniff_kind

__all__ = ["ExtractResult", "extract_turn", "sniff_kind"]
