"""Count-min sketch over the token stream, dialect-rendered.

The classic heavy-hitter sketch (Cormode/Muthukrishnan '05) as a
first-class relational operator: ``depth`` seeded MD5 hash rows map
each token into a ``width``-cell row, cell counts are a plain
partial-aggregated groupBy (one shuffle of at most depth×width
groups), and a point estimate is the MIN over the token's depth
cells.  Everything is deterministic (seeded MD5, no RNG state), so
the DuckDB oracle hash-matches the Spark run exactly — the driver
verifies both the sketch construction AND its estimation guarantee
(estimate >= truth, overcount bounded by row collisions).

At 100 TB the sketch is THE way to get approximate vocabulary heavy
hitters without shuffling the full billion-term vocabulary: the
sketch table is depth×width rows regardless of corpus size, and
merging shards is cell-wise addition (associative, like the curve
bases in plans/incremental.py).
"""

from __future__ import annotations

from . import sql_shared as S

CMS_DEPTH = 4
CMS_WIDTH = 256


def _cell(d: S.Dialect, tok: str, row: str) -> str:
    """Deterministic cell index in [0, width): low 2 hex chars of the
    row-seeded MD5.  Hex→int via a 2-char nibble decode (shared
    HEX_NIBBLE trick from dedup_sql's SimHash)."""
    from .dedup_sql import _nibble

    h = f"MD5(CONCAT(CAST({row} AS STRING), '#', {tok}))"
    hi = _nibble(f"SUBSTR({h}, 1, 1)")
    lo = _nibble(f"SUBSTR({h}, 2, 1)")
    return f"({hi} * 16 + {lo})"


def cms_cte(d: S.Dialect, depth: int = CMS_DEPTH) -> str:
    """The sketch table: (rw, cell, cnt) — depth×width rows total."""
    return f"""
        toks AS (
            SELECT tok FROM (
                SELECT {d.explode_tokens('text')} AS tok FROM documents
            ) t WHERE tok <> ''
        ),
        hashed AS (
            SELECT s.i AS rw, {_cell(d, 'tok', 's.i')} AS cell
            FROM toks CROSS JOIN {d.series(depth)} AS s
        ),
        cms AS (
            SELECT rw, cell, COUNT(*) AS cnt
            FROM hashed GROUP BY rw, cell
        )
    """


def q_countmin_heavy_hitters(d: S.Dialect, k: int = 20,
                             depth: int = CMS_DEPTH) -> str:
    """Top-k true-frequency tokens with their count-min estimates:
    (tok, true_tf, cms_estimate, overcount).  The hash match pins the
    sketch's exact cell layout AND that estimate >= truth for every
    reported token."""
    return f"""
        WITH {cms_cte(d, depth)},
        truth AS (
            SELECT tok, COUNT(*) AS true_tf FROM toks GROUP BY tok
        ),
        top AS (
            SELECT tok, true_tf,
                   ROW_NUMBER() OVER (ORDER BY true_tf DESC, tok) AS rank
            FROM truth
        ),
        est AS (
            SELECT t.tok, t.true_tf, t.rank, MIN(c.cnt) AS cms_estimate
            FROM top t
            CROSS JOIN {d.series(depth)} AS s
            JOIN cms c ON c.rw = s.i
                      AND c.cell = {_cell(d, 't.tok', 's.i')}
            WHERE t.rank <= {k}
            GROUP BY t.tok, t.true_tf, t.rank
        )
        SELECT tok, true_tf, cms_estimate,
               cms_estimate - true_tf AS overcount
        FROM est
    """
