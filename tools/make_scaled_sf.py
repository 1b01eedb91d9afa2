"""Build a key-integrity-preserving N× replica of a driver testdata dir —
the sf1.0-class dataset the driver doesn't ship, for scale validation.

Each replica offsets every key domain by (max_key+1)·i so joins stay exact
and selectivities stay constant. Two tables need more than key offsets to
keep the WORKLOAD linear rather than quadratic:

  - documents: replica texts are word-tagged (``r{i}_`` prepended to every
    token) so cross-replica shingle/token overlap is ZERO — within-replica
    dup/near-dup structure is preserved exactly (both sides of a planted
    pair get the same rewrite), so every dedup/jaccard/decontam answer set
    is exactly N× the original. Untagged replication would make each doc an
    (N-1)-way cross-replica near-dup and inflate pair outputs ~N²: a data
    property, not an engine one.
  - embeddings: each replica applies a replica-keyed diagonal ±1 matrix
    (deterministic sign flip per element index). Diagonal ±1 is orthogonal,
    so ALL within-replica inner products/norms are bit-preserved, while
    cross-replica cosines collapse to ~N(0, 1/sqrt(64)) — ANN/cosine answer
    sets scale exactly N×.

Usage: python tools/make_scaled_sf.py SRC_DIR DEST_DIR N [--tables a,b,...]

``--tables`` restricts the replica to the named tables (plus the COPY
dims) — the 1000x curation point needs documents/embeddings only, not a
600M-row lineitem. For N > 50 each table is written CHUNKED: ``<dest>/
<table>.parquet`` becomes a DIRECTORY of part files (<=50 replicas per
part, bounding DuckDB's union memory). Spark reads that layout natively;
DuckDB needs a ``/*.parquet`` glob — fine, because the big replicas are
bench inputs, never oracle inputs.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

COPY = ["region", "nation"]

# table -> {column: key_domain}; key domains sharing a name share offsets
KEYED = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part", "l_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}

DOMAIN_SOURCE = {
    "cust": ("customer", "c_custkey"),
    "supp": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "order": ("orders", "o_orderkey"),
    "event": ("events", "event_id"),
    "user": ("events", "user_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}


CHUNK_REPLICAS = 50  # max replicas per UNION ALL / output part file


def main(src: str, dest: str, n: int, tables: list[str] | None = None) -> None:
    os.makedirs(dest, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads={os.cpu_count()}")
    for t in list(KEYED) + COPY:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}/{t}.parquet')"
        )

    off = {
        d: con.execute(f"SELECT max({col})+1 FROM {t}").fetchone()[0]
        for d, (t, col) in DOMAIN_SOURCE.items()
    }

    for t in COPY:
        con.execute(f"COPY {t} TO '{dest}/{t}.parquet' (FORMAT PARQUET)")

    wanted = {
        t: keys for t, keys in KEYED.items() if tables is None or t in tables
    }
    for t, keys in wanted.items():
        cols = [c[0] for c in con.execute(f"DESCRIBE {t}").fetchall()]
        selects = []
        for i in range(n):
            exprs = []
            for c in cols:
                if c in keys:
                    exprs.append(f"{c} + {off[keys[c]] * i} AS {c}")
                elif t == "documents" and c == "text" and i > 0:
                    tag = f"r{i}_"
                    exprs.append(
                        f"'{tag}' || replace(text, ' ', ' {tag}') AS text"
                    )
                elif t == "documents" and c == "n_chars" and i > 0:
                    tag = f"r{i}_"
                    exprs.append(
                        f"len('{tag}' || replace(text, ' ', ' {tag}')) AS n_chars"
                    )
                elif t == "embeddings" and c == "embedding" and i > 0:
                    exprs.append(
                        "CAST(list_transform(embedding, (x, j) -> "
                        f"x * (CASE WHEN hash(j * 2654435761 + {i} * 1000003) % 2 = 0 "
                        "THEN -1 ELSE 1 END)) AS FLOAT[]) AS embedding"
                    )
                else:
                    exprs.append(c)
            selects.append(f"SELECT {', '.join(exprs)} FROM {t}")
        # A previous run may have left a file OR a part-directory at the
        # target (chunked vs single-file mode, or a larger n leaving stale
        # part_<offset> files that would silently inflate every downstream
        # read) — clear it before writing.
        target = f"{dest}/{t}.parquet"
        if os.path.isdir(target):
            shutil.rmtree(target)
        elif os.path.exists(target):
            os.remove(target)
        if n <= CHUNK_REPLICAS:
            union = " UNION ALL ".join(selects)
            con.execute(
                f"COPY ({union}) TO '{dest}/{t}.parquet' (FORMAT PARQUET)"
            )
            glob = f"{dest}/{t}.parquet"
        else:
            part_dir = target
            os.makedirs(part_dir)
            for c0 in range(0, n, CHUNK_REPLICAS):
                union = " UNION ALL ".join(selects[c0 : c0 + CHUNK_REPLICAS])
                con.execute(
                    f"COPY ({union}) TO '{part_dir}/part_{c0:05d}.parquet' "
                    "(FORMAT PARQUET)"
                )
            glob = f"{part_dir}/*.parquet"
        n_rows = con.execute(
            "SELECT count(*) FROM read_parquet(?)", [glob]
        ).fetchone()[0]
        print(f"{t}: {n_rows} rows")


if __name__ == "__main__":
    argv = sys.argv[1:]
    tables = None
    if "--tables" in argv:
        i = argv.index("--tables")
        tables = argv[i + 1].split(",")
        argv = argv[:i] + argv[i + 2 :]
    main(argv[0], argv[1], int(argv[2]), tables)
