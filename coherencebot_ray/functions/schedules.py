"""Fetch schedules (refetch-interval policies), vectorized.

Ports the reference's schedule semantics — including the float32
rounding the transition-equality tests depend on — as numpy kernels over
column arrays, applied inside the updatedb group merge and the generate
eligibility filter:

- AbstractFetchSchedule: shouldFetch clamp (AbstractFetchSchedule.java:189-203),
  setPageGoneSchedule ×1.5 capped at 0.9×max (:109-119),
  setPageRetrySchedule +1 day (:146-151), forceRefetch (:220-231),
  calculateLastFetchTime (:158-165).
- DefaultFetchSchedule (DefaultFetchSchedule.java:32-48): fetchTime +=
  interval, interval unchanged.
- AdaptiveFetchSchedule (AdaptiveFetchSchedule.java:96-146): interval
  ×(1−DEC) on modified / ×(1+INC) on notmodified, SYNC_DELTA shift,
  clamp [MIN,MAX]; float32 arithmetic, Java ``Math.round`` =
  floor(x+0.5).

All time columns are epoch **milliseconds** (int64); intervals are
**seconds** (int32 stored, float32 computed).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

# FetchSchedule state codes (crawl/FetchSchedule.java:40-47)
STATUS_MODIFIED = 0
STATUS_NOTMODIFIED = 1
STATUS_UNKNOWN = 2

SECONDS_PER_DAY = 3600 * 24


def _jround_f32(x: np.ndarray) -> np.ndarray:
    """Java Math.round(float): floor(x + 0.5) as int."""
    return np.floor(x.astype(np.float32) + np.float32(0.5)).astype(np.int64)


def _jround_f64(x: np.ndarray) -> np.ndarray:
    return np.floor(x.astype(np.float64) + 0.5).astype(np.int64)


@dataclass
class ScheduleResult:
    fetch_time: np.ndarray  # int64 ms
    fetch_interval: np.ndarray  # int32 s
    modified_time: np.ndarray  # int64 ms
    retries: np.ndarray  # uint8


class DefaultSchedule:
    """DefaultFetchSchedule: next fetch = now + interval."""

    name = "default"

    def __init__(self, default_interval: int = 2_592_000, max_interval: int = 7_776_000):
        self.default_interval = default_interval
        self.max_interval = max_interval

    def set_fetch_schedule(
        self,
        fetch_time: np.ndarray,
        interval: np.ndarray,
        modified_time: np.ndarray,
        state: np.ndarray,
        fixed_interval: np.ndarray | None = None,
    ) -> ScheduleResult:
        interval = np.where(interval == 0, self.default_interval, interval).astype(np.int64)
        if fixed_interval is not None:
            interval = np.where(fixed_interval > 0, fixed_interval, interval).astype(np.int64)
        new_ft = fetch_time + interval * 1000
        new_mod = np.where(
            (modified_time <= 0) | (state == STATUS_MODIFIED), fetch_time, modified_time
        )
        return ScheduleResult(
            fetch_time=new_ft.astype(np.int64),
            fetch_interval=interval.astype(np.int32),
            modified_time=new_mod.astype(np.int64),
            retries=np.zeros(len(fetch_time), dtype=np.uint8),
        )


class AdaptiveSchedule:
    """AdaptiveFetchSchedule with exact float32/rounding semantics."""

    name = "adaptive"

    def __init__(
        self,
        default_interval: int = 2_592_000,
        max_interval_cfg: int = 7_776_000,
        inc_rate: float = 0.4,
        dec_rate: float = 0.2,
        min_interval: float = 60.0,
        max_interval: float = 31_536_000.0,
        sync_delta: bool = True,
        sync_delta_rate: float = 0.3,
    ):
        self.default_interval = default_interval
        self.max_interval = max_interval_cfg  # AbstractFetchSchedule.maxInterval
        self.inc = np.float32(1.0) + np.float32(inc_rate)
        self.dec = np.float32(1.0) - np.float32(dec_rate)
        self.min_i = np.float32(min_interval)
        self.max_i = np.float32(max_interval)
        self.sync_delta = sync_delta
        self.sync_rate = float(sync_delta_rate)

    def set_fetch_schedule(
        self,
        fetch_time: np.ndarray,
        interval: np.ndarray,
        modified_time: np.ndarray,
        state: np.ndarray,
        fixed_interval: np.ndarray | None = None,
        inc: "np.ndarray | np.float32 | None" = None,
        dec: "np.ndarray | np.float32 | None" = None,
    ) -> ScheduleResult:
        # inc/dec may be per-row arrays (MimeAdaptiveSchedule) or the
        # schedule's scalar rates
        inc = self.inc if inc is None else inc
        dec = self.dec if dec is None else dec
        n = len(fetch_time)
        fetch_time = fetch_time.astype(np.int64)
        itv = np.where(interval == 0, self.default_interval, interval).astype(np.float32)
        ref_time = fetch_time.copy()
        mod = modified_time.astype(np.int64)

        fixed = (
            (fixed_interval > 0)
            if fixed_interval is not None
            else np.zeros(n, dtype=bool)
        )
        nonfixed = ~fixed

        mod = np.where(nonfixed & (mod <= 0), fetch_time, mod)
        mod_state = nonfixed & (state == STATUS_MODIFIED)
        itv = np.where(mod_state, itv * dec, itv)
        itv = np.where(nonfixed & (state == STATUS_NOTMODIFIED), itv * inc, itv)
        mod = np.where(mod_state, fetch_time, mod)

        if self.sync_delta:
            delta = (fetch_time - mod) // 1000  # int64 seconds
            bump = nonfixed & (delta.astype(np.float32) > itv)
            itv = np.where(bump, delta.astype(np.float32), itv)
            shift = _jround_f64(delta.astype(np.float64) * self.sync_rate * 1000.0)
            ref_time = np.where(nonfixed, fetch_time - shift, ref_time)

        itv = np.where(nonfixed & (itv < self.min_i), self.min_i, itv)
        itv = np.where(nonfixed & (itv > self.max_i), self.max_i, itv)
        if fixed_interval is not None:
            itv = np.where(fixed, fixed_interval.astype(np.float32), itv)

        stored = _jround_f32(itv)  # setFetchInterval(float) -> Math.round
        new_ft = ref_time + _jround_f64(itv.astype(np.float64) * 1000.0)
        if self.sync_delta:
            # NUTCH-1564 fix (a KNOWN GAP in the reference,
            # TODOTestCrawlDbStates.testAdaptiveFetchScheduleSyncDelta):
            # when delta is large and the interval clamps at max, the
            # SYNC_DELTA ref-time shift can push the next fetch into the
            # PAST, forcing a refetch every cycle. Clamp: the next fetch
            # is never earlier than fetch_time + min_interval.
            floor_ft = fetch_time + np.int64(round(self.min_i * 1000.0))
            new_ft = np.where(
                nonfixed & (new_ft < floor_ft), floor_ft, new_ft
            )
        return ScheduleResult(
            fetch_time=new_ft.astype(np.int64),
            fetch_interval=stored.astype(np.int32),
            modified_time=mod.astype(np.int64),
            retries=np.zeros(n, dtype=np.uint8),
        )


def clean_mime(values) -> np.ndarray:
    """MimeUtil.cleanMimeType analogue: lowercase, strip parameters
    ('text/html; charset=utf-8' -> 'text/html')."""
    out = np.empty(len(values), dtype=object)
    for i, v in enumerate(values):
        out[i] = v.split(";")[0].strip().lower() if isinstance(v, str) and v else ""
    return out


class MimeAdaptiveSchedule(AdaptiveSchedule):
    """MimeAdaptiveFetchSchedule (crawl/MimeAdaptiveFetchSchedule.java:
    52-163): AdaptiveFetchSchedule whose inc/dec rates are looked up per
    row from the fetch datum's Content-Type; unknown mimes use the
    schedule's default rates. setConf (:87-88) falls back to 0.2/0.2
    only when db.fetch.schedule.adaptive.inc_rate/dec_rate are absent,
    but a stock deployment always has them (nutch-default.xml:506-519
    sets 0.4/0.2), so the effective reference defaults are 0.4/0.2.

    ``mime_rates``: iterable of (mime, inc_rate, dec_rate) — the TSV
    mime file rows (:146-160)."""

    name = "mime_adaptive"
    wants_mime = True

    def __init__(self, mime_rates=(), default_inc: float = 0.4, default_dec: float = 0.2, **kw):
        super().__init__(inc_rate=default_inc, dec_rate=default_dec, **kw)
        self.rate_map = {
            str(m).lower(): (
                np.float32(1.0) + np.float32(i),
                np.float32(1.0) - np.float32(d),
            )
            for m, i, d in mime_rates
        }

    def set_fetch_schedule(self, fetch_time, interval, modified_time, state,
                           fixed_interval=None, mime=None) -> ScheduleResult:
        if mime is None or not self.rate_map:
            return super().set_fetch_schedule(
                fetch_time, interval, modified_time, state, fixed_interval
            )
        n = len(fetch_time)
        inc = np.full(n, self.inc, dtype=np.float32)
        dec = np.full(n, self.dec, dtype=np.float32)
        for i, mm in enumerate(clean_mime(mime)):
            r = self.rate_map.get(mm)
            if r is not None:
                inc[i], dec[i] = r
        return super().set_fetch_schedule(
            fetch_time, interval, modified_time, state, fixed_interval, inc=inc, dec=dec
        )


def _gone_interval(interval: np.ndarray, max_interval: int) -> np.ndarray:
    """setPageGoneSchedule interval update (AbstractFetchSchedule.java:109-119)."""
    itv_f = interval.astype(np.float32) * np.float32(1.5)
    grown = np.where(itv_f < np.float32(max_interval), itv_f, np.float32(max_interval) * np.float32(0.9))
    return _jround_f32(grown).astype(np.int32)


def set_page_gone_schedule(
    fetch_time: np.ndarray, interval: np.ndarray, max_interval: int
) -> tuple[np.ndarray, np.ndarray]:
    """Returns (new_fetch_time, new_interval)."""
    new_itv = _gone_interval(interval, max_interval)
    new_ft = fetch_time.astype(np.int64) + new_itv.astype(np.int64) * 1000
    return new_ft, new_itv


def set_page_retry_schedule(
    fetch_time: np.ndarray, retries: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """+1 day, retries+1 (AbstractFetchSchedule.java:146-151)."""
    return (
        fetch_time.astype(np.int64) + SECONDS_PER_DAY * 1000,
        (retries.astype(np.int64) + 1).clip(0, 255).astype(np.uint8),
    )


def should_fetch(
    fetch_time: np.ndarray,
    interval: np.ndarray,
    cur_time: int,
    max_interval: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Eligibility + far-future clamp (AbstractFetchSchedule.java:189-203).

    Returns (eligible_mask, clamped_fetch_time, clamped_interval) — the
    reference mutates the datum while deciding, and the mutated values go
    into the fetchlist entry.
    """
    ft = fetch_time.astype(np.int64).copy()
    itv = interval.astype(np.int32).copy()
    far = (ft - cur_time) > np.int64(max_interval) * 1000
    too_big = far & (itv > max_interval)
    itv = np.where(too_big, _jround_f32(np.full(len(itv), np.float32(max_interval) * np.float32(0.9))), itv).astype(np.int32)
    ft = np.where(far, cur_time, ft)
    return ft <= cur_time, ft, itv


def calculate_last_fetch_time(
    status: np.ndarray, fetch_time: np.ndarray, interval: np.ndarray, unfetched_code: int
) -> np.ndarray:
    """AbstractFetchSchedule.java:158-165."""
    return np.where(
        status == unfetched_code,
        np.int64(0),
        fetch_time.astype(np.int64) - interval.astype(np.int64) * 1000,
    )


def make_schedule(name: str, cfg) -> DefaultSchedule | AdaptiveSchedule:
    """FetchScheduleFactory analogue (crawl/FetchScheduleFactory.java:42-59)."""
    if name == "default":
        return DefaultSchedule(cfg.interval_default, cfg.interval_max)
    if name == "adaptive":
        return AdaptiveSchedule(
            default_interval=cfg.interval_default,
            max_interval_cfg=cfg.interval_max,
            inc_rate=cfg.adaptive_inc_rate,
            dec_rate=cfg.adaptive_dec_rate,
            min_interval=cfg.adaptive_min_interval,
            max_interval=cfg.adaptive_max_interval,
            sync_delta=cfg.adaptive_sync_delta,
            sync_delta_rate=cfg.adaptive_sync_delta_rate,
        )
    if name == "mime_adaptive":
        return MimeAdaptiveSchedule(
            mime_rates=getattr(cfg, "mime_rates", ()),
            default_inc=getattr(cfg, "mime_default_inc_rate", 0.4),
            default_dec=getattr(cfg, "mime_default_dec_rate", 0.2),
            default_interval=cfg.interval_default,
            max_interval_cfg=cfg.interval_max,
            min_interval=cfg.adaptive_min_interval,
            max_interval=cfg.adaptive_max_interval,
            sync_delta=cfg.adaptive_sync_delta,
            sync_delta_rate=cfg.adaptive_sync_delta_rate,
        )
    raise ValueError(f"unknown schedule: {name}")
