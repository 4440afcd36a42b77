"""OPIC scoring hooks (scoring-opic plugin analogue).

Reference: src/plugin/scoring-opic/.../OPICScoringFilter.java:
- injected score: config value, set at inject time (injectedScore no-op)
- initial score for newly linked pages: 0.0 (:81-84)
- generatorSortValue: score (:86-90)
- distributeScoreToOutlinks: page_score / validCount × internal/external
  factor per target (:119-160)
- updateDbScore: score += Σ inlink contributions (:93-102) — implemented
  inside the updatedb kernel
- indexerScore: score ** score_power (:163-170)

All float32 like the reference.
"""

from __future__ import annotations

import numpy as np


def distribute_score_to_outlinks(
    page_score: float,
    dst_hosts: np.ndarray,
    src_host: str,
    internal_factor: float = 1.0,
    external_factor: float = 1.0,
) -> np.ndarray:
    """Per-outlink score contributions for one parsed page."""
    n = len(dst_hosts)
    if n == 0:
        return np.zeros(0, dtype=np.float32)
    share = np.float32(page_score) / np.float32(n)
    internal = np.asarray(dst_hosts) == src_host
    return np.where(
        internal,
        share * np.float32(internal_factor),
        share * np.float32(external_factor),
    ).astype(np.float32)


def indexer_score(score: np.ndarray, score_power: float = 0.5) -> np.ndarray:
    """Dampen boost by score^power (OPICScoringFilter.java:163-170)."""
    return np.power(score.astype(np.float32), np.float32(score_power)).astype(np.float32)
