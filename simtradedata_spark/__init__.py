"""simtradedata_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of kay-ou/SimTradeData (see SURVEY.md).

Layout:
    session     SparkSession bootstrap tuned for local[32] and cluster parity
    catalog     table registry over the parquet test tables / engine tables
    functions/  reusable Column-expression libraries (code conversion, dates,
                cleaning) — all JVM-side, Catalyst-visible
    operators/  engine operators: as-of join, calendar alignment, resample,
                ex-rights adjustment, dedup (exact/minhash/simhash), similarity
                search, text analysis, technical indicators, top-k
    sources/    synthetic trading-data generator + parquet table IO
    streaming/  incremental upsert merge + structured-streaming ingest
    api/        the PTrade-shaped query surface (get_price, get_fundamentals, …)
"""

__version__ = "0.1.0"
