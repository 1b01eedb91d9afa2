"""Distributed provider-ingest connector — operators S1/S2/S9 + C6
(SURVEY §2.1, §2.9) re-expressed for Spark.

The reference fetches one symbol at a time over RPC, sequentially, with a
retry decorator that is broken as applied (``utils/code_utils.py:97-127``
used bare at ``baostock_fetcher.py:68`` — SURVEY §0.1). Here the symbol list
is a DataFrame and the fetch fans out via ``mapInPandas``: each partition
holds a batch of symbols, calls the provider per symbol with working
exponential-backoff retry, and yields the unified wide rows
(``unified_fetcher.py:20-34``'s 14-field row is the ingest schema). Paginated
providers (mootdx's 800-bar pages, ``mootdx_fetcher.py:133-154``) loop pages
inside the fetch with dedup handled downstream by ``dedup_exact``.

Rate limiting: per-partition token spacing — with P fetch partitions and a
provider cap of R calls/s, each partition self-limits to R/P calls/s
(``max_calls_per_sec`` is the GLOBAL budget; BaoStock's cap is 100/s,
``BaoStock_Complete_Download_Plan.md:584``). Providers that forbid
concurrency entirely (BaoStock — ``download_efficient.py:44``) set
``fetch_partitions=1``, which degrades to the reference's sequential loop
without changing any downstream code.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame

UNIFIED_SCHEMA = (
    "symbol string, trade_date date, open double, high double, low double, "
    "close double, volume double, money double, pe_ttm double, pb double, "
    "ps_ttm double, pcf double, turnover_rate double, is_st tinyint, "
    "trade_status tinyint"
)

# Adjust-factor EVENT rows (S3): what a provider's query_adjust_factor
# emits after adapters.baostock_adjust_to_unified — pass as the ``schema``
# of fetch_unified to fan the scan out; densify to daily with
# operators.adjust.densify_adjust_factors before the warehouse write.
ADJUST_EVENT_SCHEMA = (
    "symbol string, trade_date date, fore_adj double, back_adj double"
)


def with_retry(
    fn: Callable[[], pd.DataFrame],
    max_retries: int = 3,
    base_delay: float = 0.5,
    sleep=time.sleep,
) -> pd.DataFrame:
    """Exponential-backoff retry (the semantics the reference's decorator
    INTENDED: ``retry_on_failure(max_retries=3, delay=5)``, fixed here)."""
    last: Exception | None = None
    for attempt in range(max_retries):
        try:
            return fn()
        except Exception as e:  # provider errors are retryable by contract
            last = e
            if attempt < max_retries - 1:
                sleep(base_delay * (2**attempt))
    raise last  # type: ignore[misc]


def fetch_unified(
    symbols: DataFrame,
    provider: Callable[[str, str, str], pd.DataFrame],
    start_date: str,
    end_date: str,
    fetch_partitions: int = 8,
    max_calls_per_sec: float | None = None,
    max_retries: int = 3,
    schema: str = UNIFIED_SCHEMA,
) -> DataFrame:
    """S2 batch scan: symbols DataFrame (column ``symbol``) → unified wide
    rows. ``provider(symbol, start, end) -> pandas.DataFrame`` must be
    picklable (top-level function or functools.partial).

    Per-symbol failures after retries are isolated (logged row-free), the
    batch continues — matching ``fetch_unified_daily_data_batch``'s
    per-symbol error isolation (``unified_fetcher.py:152-189``)."""
    interval = (
        fetch_partitions / max_calls_per_sec if max_calls_per_sec else 0.0
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        last_call = 0.0
        for pdf in batches:
            for sym in pdf["symbol"]:
                if interval:
                    wait = last_call + interval - time.monotonic()
                    if wait > 0:
                        time.sleep(wait)
                    last_call = time.monotonic()
                try:
                    out = with_retry(
                        lambda s=sym: provider(s, start_date, end_date),
                        max_retries=max_retries,
                    )
                except Exception:
                    continue  # per-symbol isolation
                if out is not None and len(out):
                    yield out

    return symbols.select("symbol").repartition(fetch_partitions).mapInPandas(
        run, schema
    )


def paginated(
    fetch_page: Callable[[str, int, int], pd.DataFrame],
    page_size: int = 800,
    max_pages: int = 1000,
    dedup_on: list[str] | None = None,
) -> Callable[[str, str, str], pd.DataFrame]:
    """S9 pagination adapter: newest-first pages until the oldest row crosses
    ``start`` (``mootdx_fetcher.py:137-154``); concat + keep-FIRST dedup on
    ``dedup_on`` + range filter. Real pagers overlap at chunk boundaries
    when the provider's offset window slides during the walk — the reference
    drops duplicate index entries keeping the first occurrence
    (``mootdx_fetcher.py:163``), i.e. the NEWER page's row wins, which this
    reproduces (pages are appended newest-first).

    ``dedup_on`` defaults to ``["trade_date"]`` — the DAILY pager's index.
    Pagers over finer grains (minute bars, ticks) MUST pass their own row
    key (e.g. ``["trade_date", "bar_time"]``), or legitimate same-day rows
    collapse to one."""
    keys = dedup_on if dedup_on is not None else ["trade_date"]

    def fetch(symbol: str, start: str, end: str) -> pd.DataFrame:
        pages = []
        for page in range(max_pages):
            pdf = fetch_page(symbol, page * page_size, page_size)
            if pdf is None or len(pdf) == 0:
                break
            pages.append(pdf)
            if str(pdf["trade_date"].min()) <= start:
                break
        if not pages:
            return pd.DataFrame()
        out = pd.concat(pages, ignore_index=True)
        out = out.drop_duplicates(subset=keys, keep="first")
        return out[(out["trade_date"].astype(str) >= start) & (out["trade_date"].astype(str) <= end)]

    return fetch


def merge_unified(primary: DataFrame, secondary: DataFrame) -> DataFrame:
    """Column-level merge of two providers' unified frames — the engine
    form of the reference's split sourcing (mootdx serves OHLCV only,
    "Use BaoStockFetcher for those fields", mootdx_fetcher.py:108-120;
    unified_fetcher.py:83-189 is the single-provider BaoStock shape):
    full outer join on (symbol, trade_date), every other column
    coalesced primary-first. A field the primary lacks (mootdx's null
    valuation block) fills from the secondary; a day only one provider
    covers survives with the other side's fields null. One shuffle on
    the natural key; at warehouse scale both sides are already
    partitioned by it."""
    from pyspark.sql import functions as F

    keys = ["symbol", "trade_date"]
    cols = [c for c in primary.columns if c not in keys]
    p, s = primary.alias("p"), secondary.alias("s")
    return p.join(s, keys, "full_outer").select(
        *keys,
        *[
            F.coalesce(F.col(f"p.{c}"), F.col(f"s.{c}")).alias(c)
            for c in cols
        ],
    )
