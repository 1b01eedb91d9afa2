"""Property-based tests (hypothesis) for the invariant-heavy operators.

Each example ships a whole LIST of generated cases as one DataFrame, so a
property costs a handful of Spark jobs, not one per case. Deadlines are
disabled — Spark job latency is not the code under test."""

import datetime

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from simtradedata_spark.functions.codes import from_ptrade_code, to_ptrade_code
from simtradedata_spark.operators.asof import asof_join
from simtradedata_spark.operators.resample import resample_ohlc

RELAXED = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

digits = st.text("0123456789", min_size=6, max_size=6)
markets = st.sampled_from(["bare", "sh.", "sz.", ".SS", ".SH", ".SZ"])


@st.composite
def raw_codes(draw):
    num, form = draw(digits), draw(markets)
    if form == "bare":
        return num
    if form in ("sh.", "sz."):
        return form + num
    return num + form


@given(st.lists(raw_codes(), min_size=1, max_size=40))
@RELAXED
def test_code_conversion_roundtrip(spark, codes):
    """to_ptrade is idempotent-normalizing; from∘to keeps the digits and
    maps markets consistently (C1 round-trip, code_utils.py:9-94)."""
    df = spark.createDataFrame([(c,) for c in codes], "raw string")
    out = df.select(
        "raw",
        to_ptrade_code("raw").alias("pt"),
        from_ptrade_code(to_ptrade_code("raw")).alias("bs"),
        to_ptrade_code(from_ptrade_code(to_ptrade_code("raw"))).alias("pt2"),
    ).collect()
    for r in out:
        num = r["raw"].lstrip("shz.")[:6] if not r["raw"][0].isdigit() else r["raw"][:6]
        assert r["pt"].startswith(num)
        assert r["pt"].endswith((".SS", ".SZ"))
        # .SH alias normalizes to .SS, so a second round-trip is a fixpoint
        assert r["pt2"] == r["pt"]
        assert r["bs"] == ("sh." if r["pt"].endswith(".SS") else "sz.") + num


bar_rows = st.lists(
    st.tuples(
        st.sampled_from(["A", "B"]),
        st.integers(min_value=0, max_value=400),  # day offset
        st.floats(min_value=1, max_value=1000, allow_nan=False, width=32),
        st.floats(min_value=0, max_value=1e6, allow_nan=False, width=32),
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda t: (t[0], t[1]),
)


@given(bar_rows)
@RELAXED
def test_resample_conserves_and_bounds(spark, rows):
    """W4 invariants for any daily series: per-period volume/money conserve,
    high/low bound all member closes, open/close are the first/last bars."""
    base = datetime.date(2022, 1, 1)
    data = [
        (
            sym,
            base + datetime.timedelta(days=off),
            float(px) * 1.01,
            float(px) * 1.02,
            float(px),
            float(px) * 1.005,
            float(vol),
            float(vol) * px,
        )
        for sym, off, px, vol in rows
    ]
    df = spark.createDataFrame(
        data,
        "symbol string, trade_date date, open double, high double,"
        " low double, close double, volume double, money double",
    )
    out = resample_ohlc(df, "M").toPandas()
    pdf = df.toPandas()
    pdf["period_start"] = pd.to_datetime(pdf["trade_date"]).dt.to_period("M").dt.start_time.dt.date
    g = pdf.sort_values("trade_date").groupby(["symbol", "period_start"])
    expect = g.agg(
        open=("open", "first"), high=("high", "max"), low=("low", "min"),
        close=("close", "last"), volume=("volume", "sum"), money=("money", "sum"),
        n_bars=("close", "size"),
    ).reset_index()
    got = out.sort_values(["symbol", "period_start"]).reset_index(drop=True)
    expect = expect.sort_values(["symbol", "period_start"]).reset_index(drop=True)
    assert len(got) == len(expect)
    for col in ["open", "high", "low", "close", "volume", "money", "n_bars"]:
        pd.testing.assert_series_equal(
            got[col].astype(float), expect[col].astype(float),
            check_names=False, rtol=1e-9,
        )


asof_case = st.tuples(
    st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=30,
             unique=True),
    st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=30,
             unique=True),
)


@given(asof_case)
@RELAXED
def test_asof_join_matches_merge_asof(spark, case):
    """J5 for arbitrary probe/build time sets: result ≡ pandas merge_asof
    (backward), i.e. most-recent-at-or-before with no lookahead."""
    left_ts, right_ts = case
    base = datetime.date(2022, 1, 1)
    d = lambda off: base + datetime.timedelta(days=off)
    left = spark.createDataFrame(
        [("k", d(o)) for o in left_ts], "symbol string, t date"
    )
    right = spark.createDataFrame(
        [("k", d(o), float(o)) for o in right_ts],
        "symbol string, t date, val double",
    )
    got = (
        asof_join(left, right, on="t", by=["symbol"], right_cols=["val"])
        .toPandas()
        .sort_values("t")
        .reset_index(drop=True)
    )
    lp = pd.DataFrame({"symbol": "k", "t": pd.to_datetime([d(o) for o in left_ts])}).sort_values("t")
    rp = pd.DataFrame(
        {"symbol": "k", "t": pd.to_datetime([d(o) for o in right_ts]),
         "val": [float(o) for o in right_ts]}
    ).sort_values("t")
    expect = pd.merge_asof(lp, rp, on="t", by="symbol").reset_index(drop=True)
    assert list(got["val"].fillna(-1)) == list(expect["val"].fillna(-1))


@st.composite
def ivm_case(draw):
    """Random bags for both join sides + random boolean split masks."""
    n_a = draw(st.integers(2, 25))
    n_b = draw(st.integers(2, 25))
    a = [
        (draw(st.integers(0, 6)), draw(st.integers(0, 99)))
        for _ in range(n_a)
    ]
    b = [
        (draw(st.integers(0, 6)), draw(st.integers(100, 199)))
        for _ in range(n_b)
    ]
    ma = [draw(st.booleans()) for _ in range(n_a)]
    mb = [draw(st.booleans()) for _ in range(n_b)]
    return a, b, ma, mb


@given(ivm_case())
@RELAXED
def test_delta_join_refresh_random_splits(spark, case):
    """IVM delta rule == full recompute for ANY split of either side,
    duplicate keys and all (bag semantics)."""
    from simtradedata_spark.operators.ivm import delta_join_refresh

    a_rows, b_rows, ma, mb = case
    a = spark.createDataFrame(a_rows, "k int, av int")
    b = spark.createDataFrame(b_rows, "k int, bv int")
    full = sorted(map(tuple, a.join(b, "k").collect()))

    a_pd = pd.DataFrame(a_rows, columns=["k", "av"])
    b_pd = pd.DataFrame(b_rows, columns=["k", "bv"])
    a_old = spark.createDataFrame(a_pd[pd.Series(ma)], "k int, av int") if any(ma) else a.limit(0)
    da = spark.createDataFrame(a_pd[~pd.Series(ma)], "k int, av int") if not all(ma) else a.limit(0)
    b_old = spark.createDataFrame(b_pd[pd.Series(mb)], "k int, bv int") if any(mb) else b.limit(0)
    db = spark.createDataFrame(b_pd[~pd.Series(mb)], "k int, bv int") if not all(mb) else b.limit(0)

    view = a_old.join(b_old, "k")
    got = sorted(
        map(tuple, delta_join_refresh(view, a_old, da, b_old, db, "k").collect())
    )
    assert got == full


@given(
    st.lists(st.integers(0, 15), min_size=1, max_size=120),
    st.integers(2, 9),
)
@RELAXED
def test_multi_ntile_random_ties(spark, values, n):
    """multi_ntile == single-partition F.ntile for random tie-heavy data
    and arbitrary tile counts (including n > N)."""
    from pyspark.sql.window import Window

    from simtradedata_spark.operators.topk import multi_ntile

    pdf = pd.DataFrame({"id": range(len(values)), "v": [float(v) for v in values]})
    sdf = spark.createDataFrame(pdf)
    w = Window.orderBy(F.col("v"), F.col("id"))
    expect = (
        sdf.select("id", F.ntile(n).over(w).alias("t"))
        .toPandas().set_index("id").sort_index()
    )
    got = (
        multi_ntile(sdf, n, {"t": (F.col("v"), ["v", "id"])}, num_buckets=4)
        .select("id", "t").toPandas().set_index("id").sort_index()
    )
    assert (got["t"] == expect["t"]).all()


@given(
    st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta", "x1", "yz"]),
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=25,
    )
)
@RELAXED
def test_unigram_logprob_matches_python_model(spark, corpora):
    """unigram_logprob == the pure-python model on arbitrary corpora: same
    doc coverage (token-less docs excluded), same counts, same mean NLL."""
    import math
    from collections import Counter

    from simtradedata_spark.operators.textstats import unigram_logprob

    rows = [(i, " ".join(toks)) for i, toks in enumerate(corpora)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in unigram_logprob(df).collect()}

    counts = Counter(t for toks in corpora for t in toks)
    n_total = sum(counts.values())
    expect = {
        i: (len(toks), math.log(n_total) - sum(math.log(counts[t]) for t in toks) / len(toks))
        for i, toks in enumerate(corpora)
        if toks
    }
    assert set(got) == set(expect)
    for i, (n_tokens, nll) in expect.items():
        assert got[i]["n_tokens"] == n_tokens
        assert abs(got[i]["avg_nll"] - round(nll, 6)) < 1e-6


@given(
    st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=16),
        min_size=1,
        max_size=15,
    ),
    st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=16),
        min_size=1,
        max_size=15,
    ),
)
@RELAXED
def test_fuzzy_join_equals_quadratic_ground_truth(spark, lnames, rnames):
    """fuzzy_join == the quadratic python ground truth on adversarial
    small-alphabet strings whose lengths straddle the short/long stratum
    boundary (min_safe_len) — the subtle part of the blocking scheme."""
    from simtradedata_spark.operators.fuzzy import fuzzy_join

    left = spark.createDataFrame(
        [(i, s) for i, s in enumerate(lnames)], "lid long, name string"
    )
    right = spark.createDataFrame(
        [(i, s) for i, s in enumerate(rnames)], "rid long, name string"
    )
    got = {
        (r["lid"], r["rid"], r["dist"])
        for r in fuzzy_join(
            left, right, "lid", "name", "rid", "name", max_dist=2
        ).collect()
    }

    def lev(a, b):
        m = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, m[0] = m[0], i
            for j, cb in enumerate(b, 1):
                prev, m[j] = m[j], min(m[j] + 1, m[j - 1] + 1, prev + (ca != cb))
        return m[len(b)]

    expect = {
        (i, j, lev(a, b))
        for i, a in enumerate(lnames)
        for j, b in enumerate(rnames)
        if lev(a, b) <= 2
    }
    assert got == expect


@st.composite
def tick_case(draw):
    """Random tick stream: a few (symbol, day) sessions, each with ticks at
    arbitrary session minutes (duplicate minutes allowed), 4-decimal
    prices, positive integer qty."""
    n = draw(st.integers(2, 60))
    rows = []
    for i in range(n):
        sym = draw(st.sampled_from(["A", "B", "C"]))
        day = draw(st.sampled_from(["2022-03-01", "2022-03-02"]))
        minute = draw(st.integers(0, 239))
        price = round(draw(st.floats(1.0, 500.0, allow_nan=False)), 4)
        qty = draw(st.integers(1, 5000))
        rows.append((sym, day, minute, price, qty, i + 1))
    return rows


@RELAXED
@given(tick_case())
def test_time_bars_match_python_groundtruth(spark, rows):
    """time_bars_from_ticks == a pure-python recomputation for every bucket
    width: OHLC by seq order, volume, exact 1e-4-unit money, n_ticks."""
    from collections import defaultdict

    from simtradedata_spark.operators.resample import time_bars_from_ticks

    def hhmm(m):
        return (9 + (m + 30) // 60) * 100 + (m + 30) % 60 if m < 120 \
            else (13 + (m - 120) // 60) * 100 + (m - 120) % 60

    data = [
        (s, datetime.date.fromisoformat(d),
         int(d.replace("-", "")) * 10**9 + (hhmm(m) // 100 * 10**7)
         + (hhmm(m) % 100) * 10**5, p, q, seq)
        for (s, d, m, p, q, seq) in rows
    ]
    df = spark.createDataFrame(
        data, "symbol string, trade_date date, ts_ms long, price double, "
              "qty long, seq int",
    )
    for minutes in (1, 30, 120):
        got = {
            (r["symbol"], str(r["trade_date"]), r["bar_time"]): r
            for r in time_bars_from_ticks(df, minutes=minutes).collect()
        }
        buckets = defaultdict(list)
        for (s, d, m, p, q, seq) in rows:
            buckets[(s, d, hhmm(m // minutes * minutes))].append((seq, p, q))
        assert set(got) == set(buckets)
        for k, ticks in buckets.items():
            ticks.sort()
            g = got[k]
            assert g["open"] == ticks[0][1] and g["close"] == ticks[-1][1]
            assert g["high"] == max(p for _, p, _ in ticks)
            assert g["low"] == min(p for _, p, _ in ticks)
            assert g["volume"] == sum(q for _, _, q in ticks)
            assert g["n_ticks"] == len(ticks)
            money_e4 = sum(round(p * 10000) * q for _, p, q in ticks)
            assert g["money"] == money_e4 / 10000.0
            want_vwap = ((2 * money_e4 * 100 + g["volume"])
                         // (2 * g["volume"])) / 1e6
            assert g["vwap"] == want_vwap


# --- BPE merge learning: random tiny-alphabet corpora hammer the
# (count desc, left, right) tie-break and the fold's non-overlap rule ---

words_2char = st.lists(
    st.text("ab", min_size=1, max_size=5), min_size=1, max_size=12
)


@RELAXED
@given(st.lists(words_2char, min_size=1, max_size=4))
def test_bpe_learn_matches_reference_on_random_corpora(spark, corpora):
    from tests.test_bpe import _py_bpe
    from simtradedata_spark.operators.bpe import bpe_learn

    texts = [" ".join(ws) for ws in corpora]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges, _ = bpe_learn(df, num_merges=4)
    assert merges == _py_bpe(texts, 4)


# --- k-means: random low-d vectors (duplicates likely) must match the
# pure-python rounded Lloyd reference including distance ties ---

vec2 = st.tuples(
    st.integers(min_value=-3, max_value=3),
    st.integers(min_value=-3, max_value=3),
)


@RELAXED
@given(st.lists(vec2, min_size=3, max_size=20))
def test_kmeans_matches_reference_on_random_points(spark, pts):
    from tests.test_clustering import _py_kmeans
    from simtradedata_spark.operators.clustering import kmeans

    rows = [(i, [float(x), float(y)]) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: (r["cluster"], r["dist"])
        for r in kmeans(df, k=3, iters=2).collect()
    }
    assert got == _py_kmeans([(i, v) for i, v in rows], k=3, iters=2)


# ---------------------------------------------------------------------------
# densify_adjust_factors (round-6 provider seam; the fore-normalizer bug the
# r6 review caught motivates property coverage: random event sets, spines
# that may or may not cover every event)
# ---------------------------------------------------------------------------

@st.composite
def adjust_scenarios(draw):
    """(events, spine_days): 1-4 events per symbol with increasing back
    factors (cumprod >= 1), a 30-day spine that covers a random prefix of
    them — events beyond the spine exercise the out-of-range normalizer."""
    n_events = draw(st.integers(1, 4))
    # event days inside a 60-day domain; spine samples days 0..29 only
    days = sorted(draw(st.lists(
        st.integers(0, 59), min_size=n_events, max_size=n_events, unique=True
    )))
    ratios = draw(st.lists(
        st.floats(1.01, 1.5, allow_nan=False), min_size=n_events, max_size=n_events
    ))
    back = []
    acc = 1.0
    for r in ratios:
        acc = round(acc * r, 6)
        back.append(acc)
    final = back[-1]
    events = [
        (d, round(b / final, 6), b) for d, b in zip(days, back)
    ]
    return events


@given(st.lists(adjust_scenarios(), min_size=1, max_size=8))
@RELAXED
def test_densify_adjust_factors_properties(spark, scenarios):
    from simtradedata_spark.operators.adjust import densify_adjust_factors

    base = datetime.date(2023, 1, 1)
    ev_rows, spine_rows = [], []
    for i, events in enumerate(scenarios):
        sym = f"S{i}"
        for d, fore, back in events:
            ev_rows.append((sym, base + datetime.timedelta(days=d), fore, back))
        for d in range(30):
            spine_rows.append((sym, base + datetime.timedelta(days=d)))
    ev = spark.createDataFrame(
        ev_rows, "symbol string, trade_date date, fore_adj double, back_adj double"
    )
    spine = spark.createDataFrame(spine_rows, "symbol string, trade_date date")
    out = densify_adjust_factors(ev, spine).toPandas()

    # 1. exactly one output row per spine day, never more or fewer
    assert len(out) == len(spine_rows)
    by = {(r.symbol, r.trade_date): r for r in out.itertuples()}
    for i, events in enumerate(scenarios):
        sym = f"S{i}"
        final_back = events[-1][2]  # from ALL events, even out-of-spine
        for d in range(30):
            r = by[(sym, base + datetime.timedelta(days=d))]
            covering = [e for e in events if e[0] <= d]
            if not covering:
                # 2. pre-first-event days: back 1, fore normalized against
                # the TRUE final event (the r6 review bug: deriving the
                # normalizer from the sampled rows breaks when the final
                # event is past the spine)
                assert r.back_adj == 1.0
                assert abs(r.fore_adj - round(1.0 / final_back, 6)) <= 1e-6
            else:
                # 3. covered days carry the latest covering event's values
                _, fore, back = covering[-1]
                assert abs(r.back_adj - back) <= 1e-6
                assert abs(r.fore_adj - fore) <= 1e-6
            # 4. the cumprod identity holds everywhere within rounding
            assert abs(r.fore_adj - r.back_adj / final_back) <= 2e-6
