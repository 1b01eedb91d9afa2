"""Deterministic Spark-native synthetic A-share market generator.

Replaces the reference's provider fetch layer (S1-S10,
``simtradedata/fetchers/unified_fetcher.py:20-34,83-150`` — the unified
14-field daily row) with pure DataFrame generation: ``spark.range`` over
symbols × trading days, all randomness derived from ``xxhash64(seed, key)``
column expressions — no Python RNG in the data path, so the output is
identical for any partitioning, parallelism, or executor count, and scales
linearly (100 TB of synthetic bars is just a bigger range).

Schemas follow FIXTURES.md / SURVEY §1.2; required edge cases are generated
deterministically:
  - suspension runs ≥3 days (flat OHLC at prior close, volume=0, status=0)
    per ``BaoStock_API_Reference.md:330`` semantics,
  - one mid-range IPO symbol and one mid-range delisting,
  - an ST flip for ≥1 symbol,
  - a benchmark index series (``000300.SS``) with no adjust-factor rows
    (``baostock_fetcher.py:98-104``),
  - ex-rights events whose back_adj step function satisfies the cumprod
    relation (``DATA_MAPPING.md:536-575``).
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

BENCHMARK = "000300.SS"


# Financial-statement fields (spec PTrade_API_mini_Reference.md:3274-3412:
# balance_statement / income_statement / cashflow_statement / eps — the
# reference's own impl lacks these tables, ptrade_data_api.py:425-598; field
# names follow the spec's examples plus canonical statement lines). Values
# are uniform in (lo, hi), 亿-yuan units for the big-ticket lines — modest
# magnitudes keep round(x, 4) far from float-representability ties
# cross-engine. Single source of truth: the generator AND the DuckDB oracle
# (queries.py::_sql_statement_fields) both derive from this dict.
STATEMENT_FIELDS: dict[str, tuple[float, float]] = {
    # balance_statement
    "total_assets": (10.0, 5000.0),
    "total_liability": (5.0, 3000.0),
    "total_shareholder_equity": (5.0, 2000.0),
    "fixed_assets": (1.0, 800.0),
    "cash_equivalents": (1.0, 500.0),
    "sold_buyback_secu_proceeds": (0.0, 50.0),
    "specific_account_payable": (0.0, 20.0),
    # income_statement
    "operating_revenue": (5.0, 3000.0),
    "operating_cost": (3.0, 2500.0),
    "operating_profit": (-50.0, 500.0),
    "total_profit": (-50.0, 550.0),
    "net_profit": (-50.0, 450.0),
    "income_tax": (0.0, 100.0),
    # eps (元 per share; basic_eps shared with income_statement)
    "basic_eps": (-1.0, 3.0),
    "diluted_eps": (-1.0, 3.0),
    "naps": (1.0, 20.0),
    "operating_revenue_per_share": (0.5, 30.0),
    "capital_reserve_per_share": (0.1, 8.0),
    "retained_earnings_per_share": (-1.0, 10.0),
    # cashflow_statement
    "net_operate_cash_flow": (-100.0, 600.0),
    "net_invest_cash_flow": (-300.0, 100.0),
    "net_finance_cash_flow": (-200.0, 300.0),
    "cash_equivalent_increase": (-150.0, 250.0),
    "end_period_cash_equivalent": (0.0, 500.0),
}

# Ability-table base indicators (reference ``ptrade_data_api.py:484-590`` four
# per-domain fetchers; field lists ``docs/PTrade_API_mini_Reference.md:3274-3412``).
# name → (lo, hi); the generator salts _rng01 with the field name, so these
# ranges are the single source of truth shared with the DuckDB oracles
# (queries.py::_sql_statement_asof), exactly like STATEMENT_FIELDS.
ABILITY_FIELDS: dict[str, tuple[float, float]] = {
    # order preserved from the original inline generator list (column order
    # of SyntheticMarket.fundamentals() is part of the fixture contract)
    "roe": (-5.0, 25.0),
    "roa": (-3.0, 15.0),
    "net_profit_ratio": (-10.0, 40.0),
    "gross_income_ratio": (5.0, 60.0),
    "current_ratio": (0.5, 4.0),
    "quick_ratio": (0.3, 3.0),
    "debt_equity_ratio": (5.0, 150.0),
    "accounts_receivables_turnover_rate": (1.0, 20.0),
    "inventory_turnover_rate": (1.0, 15.0),
    "total_asset_turnover_rate": (0.1, 3.0),
    "current_assets_turnover_rate": (0.5, 6.0),
    "operating_revenue_grow_rate": (-30.0, 80.0),
    "net_profit_grow_rate": (-50.0, 120.0),
    "total_asset_grow_rate": (-10.0, 50.0),
    "basic_eps_yoy": (-40.0, 90.0),
    "np_parent_company_yoy": (-40.0, 90.0),
    "interest_cover": (0.5, 30.0),
    "roic": (-5.0, 20.0),
}

# TTM columns: rolling 4-quarter mean of the (rounded) quarterly base value,
# null for the first 3 quarters (DATA_MAPPING.md:741-755).
TTM_FIELDS: dict[str, str] = {
    "roe_ttm": "roe",
    "roa_ttm": "roa",
    "gross_income_ratio_ttm": "gross_income_ratio",
    "net_profit_ratio_ttm": "net_profit_ratio",
    "roa_ebit_ttm": "roa",
}


def _bounded_seq_window(*order_cols) -> Window:
    """One ordered partition over a BOUNDED-by-construction series.

    The calendar index and the single benchmark walk are inherently
    sequential (global row_number / running float sum whose addition order
    must match the DuckDB oracle exactly), and by design they are
    calendar-sized — the per-symbol fact tables never pass through them.
    Partitioning by a constant bucket executes identically to an
    unpartitioned window (one exchange to one partition) but declares the
    intent, so WindowExec's no-partition warning stays a meaningful signal
    for REAL single-partition regressions elsewhere. The bucket key is
    ``pmod(xxhash64(first_order_col), 1)`` — identically zero, but opaque to
    Catalyst (a literal key is constant-folded and the partition spec pruned;
    ``col IS NULL`` is null-propagated to false on non-nullable series —
    both reintroduce the warning)."""
    first = order_cols[0]
    key = F.pmod(F.xxhash64(F.col(first) if isinstance(first, str) else first), F.lit(1))
    return Window.partitionBy(key).orderBy(*order_cols)


def _u01(*cols, salt: str, rng: str = "xxhash64") -> F.Column:
    """Deterministic uniform [0,1) from key columns — the generator's RNG.

    ``rng="xxhash64"`` (default): fastest, JVM-native — the production path.
    ``rng="md5"``: first 15 hex chars of md5 over the '|'-joined key — ~2x
    slower but reproducible bit-for-bit in any engine with md5 (the DuckDB
    oracle recomputes the identical market; see queries.py synthetic_bars).
    15 hex chars = 60 bits, so the value is exact in an int64 under ANSI."""
    if rng == "md5":
        h = F.conv(
            F.substring(F.md5(F.concat_ws("|", F.lit(salt), *cols)), 1, 15), 16, 10
        ).cast("long")
    else:
        h = F.xxhash64(F.lit(salt), *cols)
    return F.pmod(h, F.lit(1_000_000_007)).cast("double") / 1_000_000_007.0


def _u01_sql(*cols: str, salt: str, rng: str = "xxhash64") -> str:
    """SQL-string twin of ``_u01`` — the identical expression tree, parsed
    JVM-side in ONE py4j call instead of ~160 Column-API round trips per
    field (r11: the 42-indicator ``fundamentals`` select spent 1.3 s of
    pure driver time building _u01 Columns, ~10 asof-family queries pay
    it per bench pass). Operand order matches the Column form node for
    node, so values are bit-identical; the asof oracle hashes re-verify
    that."""
    key = ", ".join([f"'{salt}'"] + list(cols))
    if rng == "md5":
        h = (
            f"CAST(conv(substring(md5(concat_ws('|', {key})), 1, 15),"
            f" 16, 10) AS BIGINT)"
        )
    else:
        h = f"xxhash64({key})"
    return f"(CAST(pmod({h}, 1000000007) AS DOUBLE) / 1000000007.0D)"


@dataclass
class SyntheticMarket:
    spark: SparkSession
    n_symbols: int = 20
    start: str = "2022-01-03"
    end: str = "2023-12-29"
    seed: int = 42
    # symbols with engineered edge cases (indices into the symbol list)
    suspended_idx: tuple[int, ...] = (3,)
    ipo_idx: int = 5          # lists mid-range
    delist_idx: int = 7       # delists mid-range
    st_idx: tuple[int, ...] = (2,)
    # RNG backend: "xxhash64" (production) or "md5" (cross-engine-checkable
    # — the DuckDB oracle regenerates the identical market; see _u01).
    rng: str = "xxhash64"

    def _rng01(self, *cols, salt: str) -> F.Column:
        return _u01(*cols, salt=salt, rng=self.rng)

    def symbols(self) -> DataFrame:
        """Symbol dimension: PTrade codes 600000.SS.., 000001.SZ.. alternating."""
        return (
            self.spark.range(self.n_symbols)
            .select(
                F.col("id").alias("sym_idx"),
                F.when(
                    F.col("id") % 2 == 0,
                    F.concat(
                        F.lpad((600000 + F.col("id")).cast("string"), 6, "0"),
                        F.lit(".SS"),
                    ),
                )
                .otherwise(
                    F.concat(
                        F.lpad(F.col("id").cast("string"), 6, "0"),
                        F.lit(".SZ"),
                    )
                )
                .alias("symbol"),
            )
        )

    def trade_calendar(self) -> DataFrame:
        """calendar_date, is_trading_day — weekdays minus fixed synthetic
        holidays (first 5 weekdays of Jan/Oct, Chinese-calendar-like)."""
        cal = self.spark.sql(
            f"SELECT explode(sequence(date'{self.start}', date'{self.end}')) AS calendar_date"
        )
        dow = F.dayofweek("calendar_date")  # 1=Sun..7=Sat
        is_weekday = (dow >= 2) & (dow <= 6)
        day = F.dayofmonth("calendar_date")
        month = F.month("calendar_date")
        is_holiday = ((month == 1) & (day <= 3)) | ((month == 10) & (day <= 5))
        return cal.select(
            "calendar_date",
            (is_weekday & ~is_holiday).alias("is_trading_day"),
        )

    def trading_days(self) -> DataFrame:
        w = _bounded_seq_window("calendar_date")
        return (
            self.trade_calendar()
            .filter("is_trading_day")
            .select(
                F.col("calendar_date").alias("trade_date"),
                (F.row_number().over(w) - 1).alias("day_idx"),
            )
        )

    def _trading_days_py(self) -> list:
        """Driver-side twin of ``trading_days()``: the ordered trading-day
        list as Python ``date``s — the calendar is a pure function of
        (start, end, weekday/holiday rule), so date CONSTANTS (first day,
        IPO/delist cut days, day counts) never need a Spark job. Same rule
        the DuckDB oracle CTEs replicate; ``tests/test_generator.py``'s
        calendar assertions pin all three implementations together."""
        from datetime import date, timedelta

        d0 = date.fromisoformat(self.start)
        d1 = date.fromisoformat(self.end)
        out = []
        d = d0
        while d <= d1:
            is_weekday = d.weekday() < 5  # Mon..Fri
            is_holiday = (d.month == 1 and d.day <= 3) or (
                d.month == 10 and d.day <= 5
            )
            if is_weekday and not is_holiday:
                out.append(d)
            d += timedelta(days=1)
        return out

    def _grid(self) -> DataFrame:
        """symbols × trading days with IPO/delist spans applied."""
        days = self.trading_days()
        n_days = days.count()
        ipo_cut = n_days // 3
        delist_cut = (2 * n_days) // 3
        grid = self.symbols().crossJoin(F.broadcast(days))
        return grid.filter(
            ~(
                (F.col("sym_idx") == self.ipo_idx)
                & (F.col("day_idx") < ipo_cut)
            )
            & ~(
                (F.col("sym_idx") == self.delist_idx)
                & (F.col("day_idx") >= delist_cut)
            )
        ).withColumn("n_days", F.lit(n_days))

    def _suspended(self) -> F.Column:
        """Deterministic suspension runs: suspended symbols halt for day_idx
        in [100, 110) and [250, 253)."""
        idx = F.col("sym_idx")
        d = F.col("day_idx")
        in_run = ((d >= 100) & (d < 110)) | ((d >= 250) & (d < 253))
        return idx.isin(list(self.suspended_idx)) & in_run

    def bars(self) -> DataFrame:
        """Daily OHLCV per FIXTURES.md §2: seeded log-random-walk close, OHLC
        envelope honoring low ≤ min(o,c) ≤ max(o,c) ≤ high, suspension rows
        flat at prior close with volume=0."""
        g = self._grid()
        base_price = 5.0 + 95.0 * self._rng01(F.col("sym_idx"), salt=f"base{self.seed}")
        # Daily log return in ±2%, zero while suspended (price frozen).
        raw_ret = (0.5 - self._rng01(F.col("sym_idx"), F.col("day_idx"), salt=f"ret{self.seed}")) * 0.04
        suspended = self._suspended()
        log_ret = F.when(suspended, F.lit(0.0)).otherwise(raw_ret)
        w = (
            Window.partitionBy("sym_idx")
            .orderBy("day_idx")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        close = F.round(base_price * F.exp(F.sum(log_ret).over(w)), 4)
        wlag = Window.partitionBy("sym_idx").orderBy("day_idx")
        df = g.withColumn("suspended", suspended).withColumn("close", close)
        prev_close = F.lag("close").over(wlag)
        preclose = F.coalesce(prev_close, F.col("close"))

        spread_hi = self._rng01(F.col("sym_idx"), F.col("day_idx"), salt="hi") * 0.02
        spread_lo = self._rng01(F.col("sym_idx"), F.col("day_idx"), salt="lo") * 0.02
        open_w = self._rng01(F.col("sym_idx"), F.col("day_idx"), salt="op")
        open_ = F.round(preclose * (1 + (open_w - 0.5) * 0.02), 4)
        high = F.round(F.greatest(open_, F.col("close")) * (1 + spread_hi), 4)
        low = F.round(F.least(open_, F.col("close")) * (1 - spread_lo), 4)
        volume = F.round(
            1e5 + 1e6 * self._rng01(F.col("sym_idx"), F.col("day_idx"), salt="vol"), 0
        )
        money = F.round(volume * (high + low) / 2, 2)

        is_st = (
            F.col("sym_idx").isin(list(self.st_idx))
            & (F.col("day_idx") >= F.col("n_days") / 2)
        ).cast("tinyint")

        return df.select(
            "symbol",
            "trade_date",
            F.when(F.col("suspended"), preclose).otherwise(open_).alias("open"),
            F.when(F.col("suspended"), preclose).otherwise(high).alias("high"),
            F.when(F.col("suspended"), preclose).otherwise(low).alias("low"),
            # log_ret is 0 while suspended, so close == prior close already;
            # the explicit when() keeps the flat-OHLC invariant obvious.
            F.when(F.col("suspended"), preclose).otherwise(F.col("close")).alias("close"),
            F.when(F.col("suspended"), F.lit(0.0)).otherwise(volume).alias("volume"),
            F.when(F.col("suspended"), F.lit(0.0)).otherwise(money).alias("money"),
            F.round(preclose, 4).alias("preclose"),
            is_st.alias("is_st"),
            F.when(F.col("suspended"), F.lit(0)).otherwise(F.lit(1))
            .cast("tinyint")
            .alias("trade_status"),
            "sym_idx",
            "day_idx",
        )

    def benchmark(self) -> DataFrame:
        """Benchmark index bars under 000300.SS — same walk, no exrights."""
        days = self.trading_days()
        w = _bounded_seq_window("day_idx").rowsBetween(Window.unboundedPreceding, 0)
        ret = (0.5 - self._rng01(F.col("day_idx"), salt=f"idx{self.seed}")) * 0.02
        close = F.round(3000.0 * F.exp(F.sum(ret).over(w)), 4)
        df = days.withColumn("close", close)
        wl = _bounded_seq_window("day_idx")
        preclose = F.coalesce(F.lag("close").over(wl), F.col("close"))
        return df.select(
            F.lit(BENCHMARK).alias("symbol"),
            "trade_date",
            F.round(preclose * 1.001, 4).alias("open"),
            F.round(F.greatest(F.col("close"), preclose) * 1.002, 4).alias("high"),
            F.round(F.least(F.col("close"), preclose) * 0.998, 4).alias("low"),
            "close",
            F.round(F.lit(5e8) * (1 + self._rng01(F.col("day_idx"), salt="iv")), 0).alias(
                "volume"
            ),
            F.round(F.lit(6e11) * (1 + self._rng01(F.col("day_idx"), salt="im")), 2).alias(
                "money"
            ),
            F.round(preclose, 4).alias("preclose"),
            F.lit(0).cast("tinyint").alias("is_st"),
            F.lit(1).cast("tinyint").alias("trade_status"),
            F.lit(-1).cast("bigint").alias("sym_idx"),
            "day_idx",
        )

    def exrights(self) -> DataFrame:
        """Ex-rights events (FIXTURES §5): each symbol with sym_idx % 3 == 0
        gets 2 events (bonus shares + cash dividend) at day_idx 120 and 360.

        PTrade linear form (``PTrade_API_mini_Reference.md:2992-3002``):
        forward-adjusted price = A·price + B with, for a bonus ratio b
        (shares per share) and cash dividend d (CNY per share):
            A = 1/(1+b),  B = -d/(1+b)   …applied backwards in time
        """
        days = self.trading_days()
        ev = (
            self.symbols()
            .filter((F.col("sym_idx") % 3 == 0))
            .crossJoin(F.broadcast(days.filter(F.col("day_idx").isin(120, 360))))
        )
        bonus = F.round(0.2 + 0.3 * self._rng01(F.col("sym_idx"), F.col("day_idx"), salt="bo"), 4)
        div = F.round(0.1 + 0.4 * self._rng01(F.col("sym_idx"), F.col("day_idx"), salt="dv"), 4)
        return ev.select(
            "symbol",
            F.col("trade_date").alias("ex_date"),
            F.lit(0.0).alias("allotted_ps"),
            F.lit(0.0).alias("rationed_ps"),
            F.lit(0.0).alias("rationed_px"),
            bonus.alias("bonus_ps"),
            div.alias("dividend_ps"),
            (1.0 / (1.0 + bonus)).alias("exer_forward_a"),
            (-div / (1.0 + bonus)).alias("exer_forward_b"),
            (1.0 + bonus).alias("exer_backward_a"),
            div.alias("exer_backward_b"),
            "sym_idx",
            "day_idx",
        )

    def adjust_factor(self) -> DataFrame:
        """Daily back/fore adjust factors consistent with exrights: back_adj
        is the running product of per-event ratios (1+bonus) — a step function
        that steps ON ex_date; fore_adj = back_adj / final back_adj."""
        bars = self.bars().filter(F.col("sym_idx") >= 0)
        ev = self.exrights().select(
            "symbol",
            F.col("ex_date").alias("trade_date"),
            (F.lit(1.0) + F.col("bonus_ps")).alias("ratio"),
        )
        joined = bars.select("symbol", "trade_date").join(
            ev, ["symbol", "trade_date"], "left"
        )
        w = (
            Window.partitionBy("symbol")
            .orderBy("trade_date")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        wall = Window.partitionBy("symbol").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        back = F.exp(F.sum(F.log(F.coalesce(F.col("ratio"), F.lit(1.0)))).over(w))
        out = joined.withColumn("back_adj", back).withColumn(
            "fore_adj", F.col("back_adj") / F.max("back_adj").over(wall)
        )
        return out.select(
            "symbol",
            "trade_date",
            F.round("fore_adj", 6).alias("fore_adj"),
            F.round("back_adj", 6).alias("back_adj"),
        )

    def valuation(self) -> DataFrame:
        """Daily valuation ratios (FIXTURES §3); total_value = close ×
        total_shares (``DATA_MAPPING.md:464-466``); loss-makers get null
        pe_ttm."""
        bars = self.bars().filter(F.col("sym_idx") >= 0)
        shares = F.round(1e8 * (1 + 9 * self._rng01(F.col("sym_idx"), salt="sh")), 0)
        eps = (0.5 - self._rng01(F.col("sym_idx"), salt="eps")) * 10  # some negative
        pe = F.when(eps > 0, F.round(F.col("close") / eps, 4))
        # Market caps decimal-exact: close (1e-4-quantized) × integer shares
        # is an EXACT 4-decimal value, so float round(x, 2) lands on exact
        # .5 ties ~1/100 rows where engines disagree within an ulp — do the
        # half-up in int64 instead (product ≈ 1e14 ≪ 2^63; cf. adjust.py).
        # The division must ALSO stay integral: v*7+500 can reach ~1.75e16
        # > 2^53, so `(x / 1000).cast("long")` would round the double
        # numerator ±1 before truncating and disagree with the oracle's
        # BIGINT `//` on ≡999 (mod 1000) ties. SQL `div` is exact int64.
        bars = bars.withColumn(
            "__v", F.round(F.col("close") * 1e4).cast("long") * shares.cast("long")
        )
        total_value = F.expr("(__v + 50) div 100") / 100.0
        float_value = F.expr("(__v * 7 + 500) div 1000") / 100.0
        return bars.select(
            "symbol",
            "trade_date",
            pe.alias("pe_ttm"),
            F.round(F.lit(1.0) + 5 * self._rng01(F.col("sym_idx"), F.col("day_idx"), salt="pb"), 4).alias("pb"),
            F.round(F.lit(1.0) + 10 * self._rng01(F.col("sym_idx"), F.col("day_idx"), salt="ps"), 4).alias("ps_ttm"),
            F.round(F.lit(2.0) + 20 * self._rng01(F.col("sym_idx"), F.col("day_idx"), salt="pcf"), 4).alias("pcf"),
            F.round(100 * F.col("volume") / shares, 6).alias("turnover_rate"),
            shares.alias("total_shares"),
            total_value.alias("total_value"),
            float_value.alias("float_value"),
        )

    def fundamentals(self) -> DataFrame:
        """Quarterly reports (FIXTURES §6) with publ_date = end_date + 30-80
        days (drives as-of tests) and one restatement (merge_seq=1) per
        symbol for the 2022Q4 report."""
        quarters = self.spark.sql(
            """SELECT explode(array(
                 date'2022-03-31', date'2022-06-30', date'2022-09-30', date'2022-12-31',
                 date'2023-03-31', date'2023-06-30', date'2023-09-30', date'2023-12-31'
               )) AS end_date"""
        )
        base = self.symbols().crossJoin(F.broadcast(quarters))
        lag_days = (30 + 50 * self._rng01(F.col("sym_idx"), F.col("end_date"), salt="lag")).cast("int")
        report_type = (F.quarter("end_date")).cast("tinyint")
        first = base.select(
            "symbol",
            "end_date",
            F.date_add("end_date", lag_days).alias("publ_date"),
            report_type.alias("report_type"),
            F.lit(0).cast("tinyint").alias("merge_seq"),
            "sym_idx",
        )
        restated = first.filter(
            (F.month("end_date") == 12) & (F.year("end_date") == 2022)
        ).select(
            "symbol",
            "end_date",
            F.date_add("publ_date", 60).alias("publ_date"),
            "report_type",
            F.lit(1).cast("tinyint").alias("merge_seq"),
            "sym_idx",
        )
        allrows = first.unionByName(restated)
        # SQL-rendered indicator exprs (_u01_sql): the Column-API form
        # `round(lo + (hi-lo)*_rng01(...), 4)` builds the tree
        # Round(Add(Multiply(u, hi-lo), lo)) via __radd__/__rmul__ (pyspark
        # does not swap operands), which is exactly what the string below
        # parses to — one py4j call per field instead of ~160.
        def ind(name: str, lo: float, hi: float) -> F.Column:
            u = _u01_sql(
                "sym_idx", "end_date", "merge_seq", salt=name, rng=self.rng
            )
            return F.expr(f"round({u} * {hi - lo!r}D + {lo!r}D, 4)").alias(name)
        indicators = [
            # ability tables + three statements + per-share table (same tall
            # frame — each PTrade table name is a projection, api/ptrade.py);
            # ranges shared with the DuckDB oracles via the module dicts.
            *[ind(n, lo, hi) for n, (lo, hi) in ABILITY_FIELDS.items()],
            *[ind(n, lo, hi) for n, (lo, hi) in STATEMENT_FIELDS.items()],
        ]
        out = allrows.select("symbol", "end_date", "publ_date", "report_type", "merge_seq", "sym_idx", *indicators)
        # TTM columns: rolling 4-quarter mean of the quarterly value
        # (DATA_MAPPING.md:741-755); null for the first 3 quarters.
        w4 = (
            Window.partitionBy("symbol", "merge_seq")
            .orderBy("end_date")
            .rowsBetween(-3, 0)
        )
        cnt = F.count(F.lit(1)).over(w4)
        # one withColumns call (one analysis pass) instead of a 5-deep
        # withColumn chain — identical projection, cheaper plan build
        return out.withColumns(
            {
                ttm: F.when(cnt >= 4, F.round(F.avg(src).over(w4), 4))
                for ttm, src in TTM_FIELDS.items()
            }
        )

    def stock_metadata(self) -> DataFrame:
        """FIXTURES §7: names (with an ST- and a 退-prefixed one), listed /
        de-listed dates, industry blocks map."""
        # calendar constants from the driver-side twin (_trading_days_py):
        # the old shape ran FOUR eager Spark jobs (count + three firsts)
        # per build for values that are pure functions of the calendar
        # config — ~1 s of the metadata dimension's plan-build time (r11)
        days_py = self._trading_days_py()
        n_days = len(days_py)
        d0v = days_py[0]
        ipov = days_py[n_days // 3]
        delv = days_py[(2 * n_days) // 3]
        industries = ["bank", "tech", "energy", "consumer", "health"]
        ind = F.element_at(
            F.array(*[F.lit(x) for x in industries]),
            (F.col("sym_idx") % len(industries) + 1).cast("int"),
        )
        name = (
            F.when(F.col("sym_idx").isin(list(self.st_idx)), F.concat(F.lit("ST股票"), F.col("sym_idx").cast("string")))
            .when(F.col("sym_idx") == self.delist_idx, F.concat(F.lit("退市股"), F.col("sym_idx").cast("string")))
            .otherwise(F.concat(F.lit("股票"), F.col("sym_idx").cast("string")))
        )
        return self.symbols().select(
            "symbol",
            name.alias("stock_name"),
            F.when(F.col("sym_idx") == self.ipo_idx, F.lit(ipov))
            .otherwise(F.lit(d0v))
            .alias("listed_date"),
            F.when(F.col("sym_idx") == self.delist_idx, F.lit(delv))
            .otherwise(F.lit(None).cast("date"))
            .alias("de_listed_date"),
            F.lit(True).alias("has_info"),
            F.create_map(
                F.lit("industry"), ind,
                F.lit("industry_classification"), F.concat(F.lit("csrc_"), ind),
            ).alias("blocks"),
            "sym_idx",
        )

    def index_constituents(self) -> DataFrame:
        """FIXTURES §8: quarterly samples; membership = hash-rotating subset
        so it changes between samples."""
        samples = self.spark.sql(
            """SELECT explode(array(
                 date'2022-01-04', date'2022-04-01', date'2022-07-01', date'2022-10-10',
                 date'2023-01-04', date'2023-04-03', date'2023-07-03', date'2023-10-09'
               )) AS sample_date"""
        )
        idx = self.spark.createDataFrame(
            [("000016.SS",), ("000300.SS",), ("000905.SS",)], ["index_code"]
        )
        grid = idx.crossJoin(samples).crossJoin(self.symbols())
        member = self._rng01(
            F.col("index_code"), F.col("sample_date"), F.col("sym_idx"), salt="member"
        ) < 0.5
        return grid.filter(member).select("index_code", "sample_date", "symbol")

    def stock_status(self) -> DataFrame:
        """Persisted form of the reference's in-memory status cache
        (``download_efficient.py:117-118``, TODO at ``:424``)."""
        bars = self.bars().filter(F.col("sym_idx") >= 0)
        return bars.select(
            "symbol",
            "trade_date",
            (F.col("is_st") == 1).alias("is_st"),
            (F.col("trade_status") == 0).alias("is_halt"),
        )

    def etf_metadata(self) -> DataFrame:
        """ETF dimension (spec ``PTrade_API_mini_Reference.md:2424-2552,
        3464-3504``): one ETF per index the warehouse tracks, field set of
        ``get_etf_info``."""
        rows = [
            ("510050.SS", "上证50ETF", "000016.SS", "510051"),
            ("510300.SS", "沪深300ETF", "000300.SS", "510301"),
            ("510500.SS", "中证500ETF", "000905.SS", "510501"),
        ]
        df = self.spark.createDataFrame(
            rows, "etf_code string, etf_name string, index_code string,"
            " etf_redemption_code string"
        )
        u = lambda salt: self._rng01(F.col("etf_code"), salt=f"{salt}{self.seed}")
        return df.select(
            "*",
            F.lit(1).alias("publish"),
            F.lit(1_000_000).alias("report_unit"),
            F.lit(0.4).alias("max_cash_ratio"),
            F.round((u("cash") - 0.5) * 2000, 2).alias("cash_balance"),
            F.round(u("pcc") * 1000, 2).alias("pre_cash_component"),
            F.round(1e5 + u("navpc") * 2e5, 2).alias("nav_percu"),
            F.round(0.1 + u("nav") * 5, 3).alias("nav_pre"),
            F.lit(0.0).alias("allot_max"),
            F.lit(0.0).alias("redeem_max"),
        )

    def cb_metadata(self) -> DataFrame:
        """Convertible-bond dimension (spec ``:1717-1776,2721-2774``): one
        CB for every sym_idx % 4 == 1 stock. convert_rate = 100 face value /
        convert_price; convert_value needs the live close, so it is derived
        at query time (api.get_cb_info)."""
        # day-30 constant from the driver-side calendar twin (no Spark job;
        # see stock_metadata)
        list_d = self._trading_days_py()[30]
        base = self.symbols().filter(F.col("sym_idx") % 4 == 1)
        meta = self.stock_metadata().select("symbol", "stock_name")
        base = base.join(meta, "symbol")
        code = F.when(
            F.col("symbol").endswith(".SS"),
            F.concat(F.lit("110"), F.lpad(F.col("sym_idx").cast("string"), 3, "0"), F.lit(".SS")),
        ).otherwise(
            F.concat(F.lit("123"), F.lpad(F.col("sym_idx").cast("string"), 3, "0"), F.lit(".SZ"))
        )
        base_price = 5.0 + 95.0 * self._rng01(F.col("sym_idx"), salt=f"base{self.seed}")
        cprice = F.round(base_price * (1.0 + 0.2 * self._rng01(F.col("sym_idx"), salt="cbp")), 2)
        return base.select(
            code.alias("bond_code"),
            F.concat(F.col("stock_name"), F.lit("转债")).alias("bond_name"),
            F.col("symbol").alias("stock_code"),
            "stock_name",
            F.lit(list_d.isoformat()).alias("list_date"),
            F.round(5 + 30 * self._rng01(F.col("sym_idx"), salt="cbprem"), 2).alias("premium_rate"),
            F.lit((list_d + _dt.timedelta(days=183)).isoformat()).alias(
                "convert_date"
            ),
            F.lit(list_d.replace(year=list_d.year + 6).isoformat()).alias(
                "maturity_date"
            ),
            F.round(F.lit(100.0) / cprice, 4).alias("convert_rate"),
            cprice.alias("convert_price"),
        )

    def ticks(self, n_per_day: int = 40) -> DataFrame:
        """Deterministic intraday tick stream (spec ``:2110-2319`` — the L2
        tick surface the reference never implements): ``n_per_day`` trades
        per non-suspended (symbol, day), prices interpolating open→close
        inside the [low, high] envelope with hash noise, last tick exactly
        the close. Per-tick volumes are samples, NOT constrained to sum to
        the daily volume. Session clock: 09:30-11:30, 13:00-15:00."""
        bars = self.bars().filter(F.col("volume") > 0)
        t = bars.select(
            "symbol", "trade_date", "open", "high", "low", "close",
            "sym_idx", "day_idx",
            F.explode(F.sequence(F.lit(1), F.lit(n_per_day))).alias("seq"),
        )
        frac = F.col("seq") / n_per_day
        noise = (
            self._rng01(F.col("sym_idx"), F.col("day_idx"), F.col("seq"), salt="tickpx")
            - 0.5
        ) * (F.col("high") - F.col("low")) * 0.5
        raw = F.col("open") + (F.col("close") - F.col("open")) * frac + noise
        price = F.when(F.col("seq") == n_per_day, F.col("close")).otherwise(
            F.least(F.greatest(F.round(raw, 2), F.col("low")), F.col("high"))
        )
        minute = F.floor((F.col("seq") - 1) * 240 / n_per_day).cast("int")
        hh = F.when(minute < 120, 9 + F.floor((minute + 30) / 60)).otherwise(
            13 + F.floor((minute - 120) / 60)
        )
        mm = F.when(minute < 120, (minute + 30) % 60).otherwise((minute - 120) % 60)
        ts_ms = (
            F.date_format("trade_date", "yyyyMMdd").cast("long") * F.lit(10**9)
            + (hh * 10000 + mm * 100) * 1000
        )
        qty = (
            100 * (1 + F.floor(
                50 * self._rng01(F.col("sym_idx"), F.col("day_idx"), F.col("seq"), salt="tickq")
            ))
        ).cast("long")
        rid = lambda salt: F.pmod(
            F.xxhash64(F.lit(salt), F.col("sym_idx"), F.col("day_idx"), F.col("seq")),
            F.lit(10**9),
        )
        out = t.select(
            "symbol", "trade_date", "seq",
            ts_ms.alias("ts_ms"),
            price.alias("price"),
            qty.alias("qty"),
            rid("ord").alias("order_no"),
            rid("buy").alias("buy_no"),
            rid("sell").alias("sell_no"),
        )
        wlag = Window.partitionBy("symbol", "trade_date").orderBy("seq")
        prev = F.lag("price").over(wlag)
        direction = (
            F.when(prev.isNull() | (F.col("price") == prev), F.lit(2))
            .when(F.col("price") > prev, F.lit(1))
            .otherwise(F.lit(0))
        )
        return out.withColumn("direction", direction.cast("int"))
