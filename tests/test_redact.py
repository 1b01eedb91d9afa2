"""PII redaction — adversarial cases + idempotence (column-expr operator,
one Spark job for all cases)."""

import pyspark.sql.functions as F

from simtradedata_spark.operators.redact import pii_counts, redact_text

CASES = [
    # (text, expected_redacted, (emails, idnums, phones, ips))
    ("mail a.b+c_d%e@sub.example.co.uk now", "mail <EMAIL> now", (1, 0, 0, 0)),
    ("call 13912345678 ok", "call <PHONE> ok", (0, 0, 1, 0)),
    # 18-digit national ID must win over the 11-digit phone inside it
    ("id 11010119900101123X end", "id <IDNUM> end", (0, 1, 0, 0)),
    ("id 110101199001011234 end", "id <IDNUM> end", (0, 1, 0, 0)),
    # digits embedded in longer runs must NOT match (word boundaries)
    ("acct 9913912345678001 x", "acct 9913912345678001 x", (0, 0, 0, 0)),
    ("ip 192.168.0.1 and 10.0.0.7.", "ip <IP> and <IP>.", (0, 0, 0, 2)),
    # several kinds in one string
    (
        "u@x.io 13800138000 1.2.3.4",
        "<EMAIL> <PHONE> <IP>",
        (1, 0, 1, 1),
    ),
    # 12xxxxxxxxx is not a mobile (second digit must be 3-9)
    ("call 12912345678", "call 12912345678", (0, 0, 0, 0)),
    ("", "", (0, 0, 0, 0)),
    ("纯中文文本没有任何隐私", "纯中文文本没有任何隐私", (0, 0, 0, 0)),
]


def test_redaction_cases(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _, _) in enumerate(CASES)], ["i", "text"]
    )
    out = {
        r["i"]: r
        for r in df.select(
            "i", redact_text("text").alias("red"), *pii_counts("text")
        ).collect()
    }
    for i, (text, expect, counts) in enumerate(CASES):
        r = out[i]
        assert r["red"] == expect, f"case {i}: {r['red']!r} != {expect!r}"
        got = (r["n_email"], r["n_idnum"], r["n_phone"], r["n_ip"])
        assert got == counts, f"case {i} counts {got} != {counts}"


def test_redaction_idempotent(spark):
    df = spark.createDataFrame(
        [(t,) for t, _, _ in CASES], ["text"]
    ).select(redact_text("text").alias("once"))
    twice = df.select(
        "once", redact_text("once").alias("again")
    )
    assert twice.filter(F.col("once") != F.col("again")).count() == 0
