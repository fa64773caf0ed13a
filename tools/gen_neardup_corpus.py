#!/usr/bin/env python3
"""Controlled-duplication corpus for near-dup scale benches.

Replica-scaling the driver documents (tools/gen_scale.py) is the WRONG
corpus for near-dup benchmarks: the synthetic sf0.1 texts draw ~50
tokens from a ~30-word vocabulary, so 74 % of ALL doc pairs are
near-dups (9.2 M pairs from 5 k docs), and text-identical replicas
multiply every dup group K-fold — output grows K², an artifact of the
replication, and at 500 k docs the ~92 G emitted pairs measure nothing
but pair materialization.

A realistic corpus grows the other way: more documents at a roughly
constant duplication RATE.  This generator builds that shape,
deterministically, at any multiple of the sf0.1 corpus:

* N = K x 5000 documents; doc i belongs to a 2-doc near-dup group when
  i % 20 <= 1 (group salt = the even member's id), else is a
  singleton — a fixed 10 % of docs in dup pairs, N/20 true pairs,
  linear in N.
* Text = a base sf0.1 text (salt % 5000) with EVERY whitespace token
  suffixed by the group salt ("sparkq1040"), so token/shingle sets
  overlap only within a group under the engine's whitespace tokenizer
  (sql_shared.explode_tokens).  The odd member drops its last 3 tokens
  (near, not necessarily exact, dup).
* Embeddings (K x 2000 rows, same pair rule): hash-seeded pseudo-
  uniform FLOAT[dim] vectors per salt; pair members share the vector
  (cosine 1), cross-group cosines concentrate near 0 at dim=64.

Usage: python3 tools/gen_neardup_corpus.py [K] [out_dir]
  (defaults 10, .bench_nd10x — dirs are gitignored scratch)
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

SRC = "/root/testdata/sf0.1"
DOCS_BASE = 5000
EMB_BASE = 2000


def generate(k: int, out: Path) -> None:
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    dim = con.execute(
        f"SELECT len(embedding) FROM '{SRC}/embeddings.parquet' LIMIT 1"
    ).fetchone()[0]

    con.execute(f"""
        COPY (
            WITH base AS (
                SELECT doc_id AS b_id, text, lang, source
                FROM '{SRC}/documents.parquet'
            ),
            mem AS (
                SELECT i,
                       CASE WHEN i % 20 = 1 THEN i - 1 ELSE i END AS salt,
                       (i % 20 = 1) AS trunc
                FROM range({k * DOCS_BASE}) t(i)
            ),
            joined AS (
                SELECT m.i, m.salt, m.trunc, b.text, b.lang, b.source
                FROM mem m JOIN base b ON b.b_id = m.salt % {DOCS_BASE}
            ),
            txt AS (
                SELECT i, salt, lang, source,
                       CASE WHEN trunc THEN array_to_string(
                                (string_split(text, ' '))[
                                    1:greatest(1, len(string_split(text, ' ')) - 3)],
                                ' ')
                            ELSE text END AS t0
                FROM joined
            )
            SELECT i AS doc_id,
                   regexp_replace(t0, '(\\S+)',
                                  '\\1q' || CAST(salt AS VARCHAR), 'g')
                       AS text,
                   lang, source,
                   CAST(length(regexp_replace(t0, '(\\S+)',
                        '\\1q' || CAST(salt AS VARCHAR), 'g')) AS BIGINT)
                       AS n_chars
            FROM txt ORDER BY doc_id
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
    """)

    con.execute(f"""
        COPY (
            WITH mem AS (
                SELECT i,
                       CASE WHEN i % 20 = 1 THEN i - 1 ELSE i END AS salt
                FROM range({k * EMB_BASE}) t(i)
            )
            SELECT i AS vec_id,
                   CAST(list_transform(range(1, {dim + 1}),
                        j -> CAST(CAST(hash(salt * 1000003 + j) % 2001
                                       AS BIGINT) - 1000 AS FLOAT) / 1000.0)
                        AS FLOAT[]) AS embedding,
                   CAST(salt % 10 AS INTEGER) AS label
            FROM mem ORDER BY vec_id
        ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
    """)

    n_docs, n_emb = (con.execute(
        f"SELECT (SELECT COUNT(*) FROM '{out}/documents.parquet'), "
        f"(SELECT COUNT(*) FROM '{out}/embeddings.parquet')").fetchone())
    print(f"{out}: {n_docs} docs ({n_docs // 20} true pairs), "
          f"{n_emb} embeddings dim={dim}")


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = Path(sys.argv[2] if len(sys.argv) > 2 else
               Path(__file__).resolve().parent.parent / f".bench_nd{k}x")
    generate(k, out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
