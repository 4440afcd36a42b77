"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here calls ``ray.init`` / ``ray.shutdown``.

- ``entry()``: flagship pipeline — one full generate→fetch→parse→updatedb
  crawl round over a frontier derived from sf0.001 documents (fake
  protocol, no network); returns the resulting frontier as a DataFrame.
- ``queries()``: one entry per implemented operator (SURVEY.md §2 +
  the training-data op family); each takes ``sf_dir``.
- ``oracle_sql()``: DuckDB equivalents with matching column names.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from coherencebot_ray.pipelines.queries import (
    build_oracle_sql,
    build_queries,
    q_crawl_round,
)


def entry() -> Any:
    return q_crawl_round("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return build_queries()


def oracle_sql() -> dict[str, str]:
    return build_oracle_sql()
