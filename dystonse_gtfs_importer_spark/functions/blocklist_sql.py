"""Multi-pattern blocklist screening, dialect-rendered (Spark runs
the template, DuckDB verifies it).

Every production corpus pipeline screens text against pattern sets —
URL/domain blocklists, banned phrases, compliance terms.  The
single-process classic is an Aho-Corasick automaton (one pass, all
patterns at once); the distributed set-at-once equivalent used here
is the **per-length gram join**:

1. the pattern set is grouped by token length — blocklists are short
   phrases, so the distinct lengths are a handful;
2. for each distinct length ``n`` the corpus emits its word n-grams
   WITH POSITIONS (map-only, JVM-side array slicing — no Python);
3. grams hash-join the (tiny, broadcast) pattern table.

Work is O(corpus_tokens x distinct_lengths) + output-sized join
results — like Aho-Corasick, independent of the NUMBER of patterns
at equal lengths, and unlike it embarrassingly parallel.  Overlapping
matches are found individually (each position is its own gram);
the blocked-token accounting unions the match intervals per document
with the same running-max island window as the ExactSubstr tail, so
overlaps are never double-counted.

At 100 TB: the pattern table broadcasts (compliance lists are KBs to
MBs); the gram explode is map-only and pipelined into the join; the
only shuffle is the final doc-keyed aggregate.  No pairs stage, no
corpus-wide window (the island window partitions by doc_id).
"""

from __future__ import annotations

from collections import defaultdict

from . import sql_shared as S

# Default blocklist over the synthetic documents vocabulary —
# deliberately mixed token lengths (1..4) so every per-length branch
# of the gram join is exercised by the driver check, plus one pattern
# with a repeated token ("slow slow": overlapping self-matches) and
# one that never occurs (the empty-result branch).
BLOCKLIST: tuple[str, ...] = (
    "fast table",
    "window stream",
    "value table part",
    "scan slow",
    "agg row scan slow",
    "query line",
    "slow slow",
    "sphinx quartz",          # absent from the corpus by construction
)


def _pattern_rows(patterns: tuple[str, ...]) -> list[tuple[int, str, int]]:
    rows = []
    for i, p in enumerate(patterns):
        toks = [t for t in p.lower().split(" ") if t]
        rows.append((i, " ".join(toks), len(toks)))
    if len({p for _, p, _ in rows}) != len(rows):
        raise ValueError("duplicate patterns in blocklist")
    return rows


def _match_ctes(d: S.Dialect, patterns: tuple[str, ...],
                doc_table: str) -> str:
    """Shared CTE chain ``pats`` / ``ta`` / ``matches``: the
    per-length gram join producing one row per (doc_id, pos, pat_id,
    n_toks) match occurrence (overlaps included)."""
    rows = _pattern_rows(patterns)
    # d.str_lit handles quote doubling AND (Spark-side) backslash
    # escaping, so caller-supplied patterns render to the same
    # literal in both engines.
    vals = ", ".join("({}, {}, {})".format(i, d.str_lit(p), n)
                     for i, p, n in rows)
    by_len: dict[int, list[int]] = defaultdict(list)
    for i, _, n in rows:
        by_len[n].append(i)
    branches = []
    for n in sorted(by_len):
        branches.append(f"""
            SELECT g.doc_id, g.pos, p.pat_id, p.n_toks
            FROM (
                SELECT doc_id, i AS pos,
                       {d.arr_slice_join('ta', 'i', n)} AS gram
                FROM (
                    SELECT doc_id, ta,
                           {d.explode_range(f"{d.arr_len('ta')} - {n - 1}")}
                               AS i
                    FROM ta WHERE {d.arr_len('ta')} >= {n}
                ) x
            ) g JOIN pats p ON p.n_toks = {n} AND p.pat = g.gram""")
    matches_sql = "\n            UNION ALL".join(branches)
    return f"""pats AS (
            SELECT * FROM (VALUES {vals}) AS t(pat_id, pat, n_toks)
        ),
        ta AS (
            SELECT doc_id, {d.token_array('text')} AS ta
            FROM {doc_table}
        ),
        matches AS ({matches_sql}
        )"""


def q_blocklist_filter(d: S.Dialect,
                       patterns: tuple[str, ...] = BLOCKLIST,
                       doc_table: str = "documents") -> str:
    """Per document: blocklist match count (overlaps counted
    individually), distinct patterns hit, blocked tokens (union of
    match intervals), total tokens, and the keep verdict — the full
    corpus annotation (unmatched documents appear with zeros, LEFT
    JOIN like ``q_decontaminate``)."""
    return f"""
        WITH {_match_ctes(d, patterns, doc_table)},
        spans AS (
            SELECT doc_id, CAST(pos AS BIGINT) AS pos,
                   CAST(pos + n_toks AS BIGINT) AS en
            FROM matches
        ),
        marked AS (
            SELECT doc_id, pos, en,
                   MAX(en) OVER (PARTITION BY doc_id ORDER BY pos, en
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING) AS prev_max
            FROM spans
        ),
        isl AS (
            SELECT doc_id, pos, en,
                   SUM(CASE WHEN prev_max IS NULL OR pos > prev_max
                            THEN 1 ELSE 0 END)
                       OVER (PARTITION BY doc_id ORDER BY pos, en
                             ROWS UNBOUNDED PRECEDING) AS region
            FROM marked
        ),
        reg AS (
            SELECT doc_id, region, MIN(pos) AS s, MAX(en) AS e
            FROM isl GROUP BY doc_id, region
        ),
        blocked AS (
            SELECT doc_id, CAST(SUM(e - s) AS BIGINT) AS blocked_tokens
            FROM reg GROUP BY doc_id
        ),
        per_doc AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches,
                   CAST(COUNT(DISTINCT pat_id) AS BIGINT) AS n_patterns
            FROM matches GROUP BY doc_id
        )
        SELECT t.doc_id,
               CAST({d.arr_len('t.ta')} AS BIGINT) AS n_tokens,
               COALESCE(m.n_matches, 0) AS n_matches,
               COALESCE(m.n_patterns, 0) AS n_patterns,
               COALESCE(b.blocked_tokens, 0) AS blocked_tokens,
               CAST(CASE WHEN m.doc_id IS NULL THEN 1 ELSE 0 END AS INT)
                   AS keep
        FROM ta t
        LEFT JOIN per_doc m ON m.doc_id = t.doc_id
        LEFT JOIN blocked b ON b.doc_id = t.doc_id
    """


def q_blocklist_scrub(d: S.Dialect,
                      patterns: tuple[str, ...] = BLOCKLIST,
                      doc_table: str = "documents") -> str:
    """Excision form of the blocklist screen: instead of dropping
    whole documents, every token covered by ANY match is cut and the
    survivors are re-joined in order — the targeted-removal sibling
    of ``q_boilerplate_scrub`` (same coverage anti-join + ordered
    re-join tail), driven by the arbitrary pattern set rather than by
    corpus-frequent n-grams.  Overlapping matches cover positions
    once (coverage is a DISTINCT position set).

    Same scale shape as :func:`q_blocklist_filter` plus one map-only
    position explode and a doc_id-co-partitioned anti join — the
    pattern side broadcasts, nothing windows corpus-wide."""
    return f"""
        WITH {_match_ctes(d, patterns, doc_table)},
        cov AS (
            SELECT DISTINCT doc_id, pos + j AS p
            FROM (
                SELECT doc_id, pos, {d.explode_range('n_toks')} AS j
                FROM matches
            ) x
        ),
        toks_pos AS (
            SELECT doc_id, i AS pos, {d.arr_get('ta', 'i')} AS tok
            FROM (
                SELECT doc_id, ta, {d.explode_range(d.arr_len('ta'))} AS i
                FROM ta WHERE {d.arr_len('ta')} >= 1
            ) y
        ),
        kept AS (
            SELECT t.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_kept,
                   {d.arr_join(d.ordered_list('t.tok', 't.pos'))}
                       AS clean_text
            FROM toks_pos t
            LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.p = t.pos
            WHERE c.p IS NULL
            GROUP BY t.doc_id
        )
        SELECT t0.doc_id,
               CAST({d.arr_len('t0.ta')} AS BIGINT) AS n_tokens,
               CAST({d.arr_len('t0.ta')} - COALESCE(k.n_kept, 0) AS BIGINT)
                   AS n_removed,
               COALESCE(k.clean_text, '') AS clean_text
        FROM ta t0
        LEFT JOIN kept k ON k.doc_id = t0.doc_id
    """


def apply_blocklist(docs, patterns: tuple[str, ...] = BLOCKLIST,
                    id_col: str = "doc_id", text_col: str = "text"):
    """DataFrame pipeline form: annotate ``docs`` with the blocklist
    verdict columns (per-call temp view, dropped after analysis)."""
    import uuid

    view = f"__blk_docs_{uuid.uuid4().hex[:12]}"
    proj = docs.select(docs[id_col].alias("doc_id"),
                       docs[text_col].alias("text"))
    proj.createOrReplaceTempView(view)
    out = proj.sparkSession.sql(
        q_blocklist_filter(S.SPARK, patterns, doc_table=view))
    proj.sparkSession.catalog.dropTempView(view)
    return out
