"""Filters for two benign-but-noisy Ray Data log warnings.

Both are emitted by Ray internals, not by this package's stages, and
both were reproduced with a vanilla 10-line Ray Data script (pandas
batches -> groupby -> map_groups, no repo code):

1. ``Operator produced a RefBundle with a different schema ...
   PandasBlockSchema(names=[])`` — Ray's sort-based groupby builds
   EMPTY reduce partitions as ``pd.DataFrame()`` (zero columns) and
   map operators pass empty blocks through without calling the UDF, so
   no user function can type them. Every UDF in this package returns
   typed zero-ROW frames on its own empty paths (the round-2 simhash
   float64-promotion bug class); the cross-parallelism gate
   (tests/test_xpar_gate.py) verifies results are bitwise identical
   across block layouts, which is the condition under which this
   warning is harmless.
2. ``Failed to hash the schemas (for deduplication): unhashable type:
   'dict'`` — Ray's schema-dedup cache can't hash Parquet schemas that
   carry dict-valued pandas metadata; purely cosmetic.
3. ``Error calculating size for column '...': cannot call `vectorize`
   on size 0 inputs`` — Ray's pandas block size sampler
   (pandas_block.py:497-507) calls np.vectorize on the sampled values
   of object columns; a ZERO-ROW block's empty sample raises inside
   numpy and Ray logs the fallback. Typed zero-row frames with object
   (text) columns are correct per this package's empty-frame rule, so
   the warning is unavoidable noise; Ray catches the error and falls
   back to index-only sizing.

Install with :func:`install_log_filters` from benchmark / CLI entry
points (tests keep full logs).
"""

from __future__ import annotations

import logging

_PATTERNS = (
    "Operator produced a RefBundle with a different schema",
    "Failed to hash the schemas (for deduplication)",
    "Error calculating size for column",
)


class _NoiseFilter(logging.Filter):
    def filter(self, record: logging.LogRecord) -> bool:  # noqa: A003
        msg = record.getMessage()
        return not any(p in msg for p in _PATTERNS)


def install_log_filters() -> None:
    for name in (
        "ray.data._internal.execution.streaming_executor_state",
        "ray.data._internal.arrow_ops.transform_pyarrow",
        "ray.data",
    ):
        logging.getLogger(name).addFilter(_NoiseFilter())
