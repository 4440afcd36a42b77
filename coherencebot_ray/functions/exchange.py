"""Exchange extension point (exchange/Exchange.java,
exchange/Exchanges.java, plugin exchange-jexl/JexlExchange.java):
routes each indexed document to a subset of the configured index
writers by a per-exchange predicate.

Reference semantics (Exchanges.java:144-159 indexWriters):
- every exchange whose predicate matches contributes its writer ids
  (set union)
- if none matched and a ``default`` exchange is configured, its writer
  ids apply
- if NO exchanges are configured at all, documents route to ALL
  writers (Exchanges.java:80-83 availableExchanges=false).

The predicate language is the same vectorized JEXL subset used by the
generator/indexer expression hooks (functions/jexl.py), evaluated per
batch — one boolean mask per exchange per batch, no per-row Python.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from . import jexl


@dataclass
class ExchangeConfig:
    """One <exchange> entry (ExchangeConfig.java): id, JEXL predicate
    over document columns, target writer ids."""

    id: str
    expr: str  # JEXL predicate; "" or "default" slot via Exchanges(default_writers=...)
    writer_ids: tuple[str, ...] = field(default_factory=tuple)


class Exchanges:
    """``configs``: the non-default exchanges. ``default_writers``: the
    optional ``default`` exchange's writer ids. ``all_writers``: every
    configured writer id — the no-exchanges fallback route."""

    def __init__(
        self,
        configs: list[ExchangeConfig] | tuple = (),
        default_writers: tuple[str, ...] = (),
        all_writers: tuple[str, ...] = (),
    ):
        self.configs = list(configs)
        self.default_writers = tuple(default_writers)
        self.all_writers = tuple(all_writers)

    @property
    def available(self) -> bool:
        return bool(self.configs) or bool(self.default_writers)

    def writer_masks(self, df: pd.DataFrame) -> dict[str, np.ndarray]:
        """writer id -> boolean mask over ``df`` rows (vectorized union
        of the matching exchanges' routes)."""
        n = len(df)
        if not self.available:
            return {w: np.ones(n, dtype=bool) for w in self.all_writers}
        masks: dict[str, np.ndarray] = {w: np.zeros(n, dtype=bool) for w in self.all_writers}
        matched_any = np.zeros(n, dtype=bool)
        for cfg in self.configs:
            try:
                m = jexl.evaluate(df, cfg.expr)
            except Exception:
                # JexlExchange.match swallows evaluation errors -> no match
                continue
            matched_any |= m
            for w in cfg.writer_ids:
                masks.setdefault(w, np.zeros(n, dtype=bool))
                masks[w] |= m
        if self.default_writers:
            rest = ~matched_any
            for w in self.default_writers:
                masks.setdefault(w, np.zeros(n, dtype=bool))
                masks[w] |= rest
        return masks
