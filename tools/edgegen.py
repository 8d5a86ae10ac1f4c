#!/usr/bin/env python
"""Pathological-input corpus generator for the crash sweep.

Copies the sf0.001 testdata and appends the edge rows real corpora
contain but uniform synthetic data never does: empty / 1-token /
whitespace-only documents, a single-event user, exactly-tied event
timestamps, boundary-valued events, a zero embedding vector.  Every
contract query must *run* on this corpus (rows >= 0, no exception) —
the value-level contract stays with tools/check.py on the pristine
data; this guards the failure class the round-2 advisor found
(``slice(toks, 1, size-4)`` crashing on short docs) structurally.

Usage: python tools/edgegen.py [out_dir]   (default /tmp/sparkgraft_edge)
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

SRC = "/root/testdata/sf0.001"

#: table -> SQL producing extra rows (same schema as the source table).
EXTRA = {
    "documents": """
        SELECT * FROM (VALUES
            (900001, '', 'en', 'web', 0),
            (900002, 'x', 'en', 'web', 1),
            (900003, 'a b', 'de', 'news', 3),
            (900004, 'tok tok tok', 'fr', 'web', 11),
            (900005, '   ', 'en', 'books', 3),
            (900006, 'one two three four', 'es', 'web', 18)
        ) t(doc_id, text, lang, source, n_chars)
    """,
    "events": """
        SELECT * FROM (VALUES
            -- single-event user
            (9900001, TIMESTAMP '2024-01-15 12:00:00', 999001,
             'purchase', 0.0, '{}'),
            -- exactly tied timestamps, one user (tie-break paths)
            (9900002, TIMESTAMP '2024-01-16 00:00:00', 999002,
             'view', 150.0, '{}'),
            (9900003, TIMESTAMP '2024-01-16 00:00:00', 999002,
             'click', 300.0, '{}'),
            -- same user, duplicate minute key + threshold boundaries
            (9900004, TIMESTAMP '2024-01-16 00:00:30', 999002,
             'view', 150.0, '{}'),
            (9900005, TIMESTAMP '2024-01-17 23:59:59.999999', 999002,
             'purchase', 489.99, '{}')
        ) t(event_id, ts, user_id, event_type, value, props)
    """,
    "embeddings": """
        SELECT 990001 AS vec_id,
               list_transform(range(64), x -> CAST(0.0 AS FLOAT))
                   AS embedding,
               0 AS label
    """,
}


def main() -> None:
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparkgraft_edge")
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for tbl in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        src = f"read_parquet('{SRC}/{tbl}.parquet')"
        sql = f"SELECT * FROM {src}"
        if tbl in EXTRA:
            sql += f" UNION ALL BY NAME {EXTRA[tbl]}"
        con.execute(
            f"COPY ({sql}) TO '{out}/{tbl}.parquet' (FORMAT PARQUET)"
        )
    print(f"wrote edge corpus to {out}")


if __name__ == "__main__":
    main()
