"""The driver-facing query registry: every entry pairs a Spark
implementation with a DuckDB oracle over the same parquet tables.

Each query re-expresses one (or a family of) SURVEY.md §2 operators on
the driver's synthetic star schema; the GTFS-domain pipelines exercise
the same operators on GTFS-shaped fixtures in tests/.

Design rules (scale-first):

* Spark side is declarative (spark.sql / DataFrame API) — Catalyst
  handles pushdown, pruning, and join strategy; dimension tables get
  broadcast hints where the optimizer can't see their size.
* Shared scalar logic comes from functions.sql_shared rendered per
  dialect, so engine and oracle cannot drift.
* Every float aggregate is ROUNDed on both sides: cross-engine double
  summation-order drift must not reach the value hash.
* Timestamps leave queries as whole-second epochs (both engines
  truncate identically) — never raw sub-second timestamps.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from ..functions import ann_sql as ANN
from ..functions import blocklist_sql as BLK
from ..functions import decontam_sql as DC
from ..functions import dedup_sql as D
from ..functions import pii_sql as PII
from ..functions import sampling_sql as SAMP
from ..functions import sketch_sql as SK
from ..functions import sql_shared as S
from ..operators import perceptual as PERC
from ..operators.layout import q_zorder_keys
from ..sources.testdata import register_views


@dataclass
class QueryDef:
    """A Spark query plus its DuckDB oracle (None → rows-only check).

    ``oracle`` may be a SQL string or a zero-arg callable returning
    one — the callable form lets an oracle be derived lazily (e.g.
    the curve-stack literal table recomputed from the fixture)."""

    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | Callable[[], str] | None
    survey_ref: str  # SURVEY.md §2 operator ids this covers


def _sql_pair(template: Callable[[S.Dialect], str], survey_ref: str) -> QueryDef:
    """Build a QueryDef whose Spark side runs the dialect-rendered SQL
    over registered temp views — maximal engine/oracle parity."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from ..session import configure_for_oracle

        configure_for_oracle(spark)
        register_views(spark, sf_dir)
        return spark.sql(template(S.SPARK))

    return QueryDef(spark=run, oracle=template(S.DUCKDB), survey_ref=survey_ref)


def _sql_cross_pair(spark_template: Callable[[S.Dialect], str],
                    oracle_template: Callable[[S.Dialect], str],
                    survey_ref: str) -> QueryDef:
    """Spark runs one derivation, the oracle a DIFFERENT one — the hash
    match proves the two derivations agree (e.g. a banded scale path vs
    its quadratic reference form)."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from ..session import configure_for_oracle

        configure_for_oracle(spark)
        register_views(spark, sf_dir)
        return spark.sql(spark_template(S.SPARK))

    return QueryDef(spark=run, oracle=oracle_template(S.DUCKDB),
                    survey_ref=survey_ref)


def _epoch_s(ts: str, d: S.Dialect) -> str:
    """Whole-second epoch (truncated) — identical in both engines."""
    if d.name == "spark":
        return f"unix_timestamp({ts})"
    return f"(epoch_us({ts}) // 1000000)"


# ---------------------------------------------------------------------------
# aggregations (A1, A2, A8, A9, F13)
# ---------------------------------------------------------------------------

def q_pricing_summary(d: S.Dialect) -> str:
    # A9/A1-style multi-aggregate with sanity filter (F1 analog) and
    # post-aggregation min-sample gate (F13)
    return """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               ROUND(AVG(l_quantity), 4) AS avg_qty,
               ROUND(AVG(l_discount), 4) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2024-09-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        HAVING COUNT(*) >= 10
    """


def q_hourly_event_stats(d: S.Dialect) -> str:
    # A1: fixed-width time buckets with count + avg
    bucket = _epoch_s("date_trunc('hour', ts)", d)
    return f"""
        SELECT {bucket} AS bucket_s, event_type,
               COUNT(*) AS n,
               ROUND(AVG(value), 4) AS avg_value,
               ROUND(SUM(value), 4) AS sum_value
        FROM events
        WHERE value BETWEEN -36000 AND 36000
        GROUP BY 1, 2
    """


def q_global_minmax(d: S.Dialect) -> str:
    # A2: global min/max of the recording time + value bounds
    lo = _epoch_s("MIN(ts)", d)
    hi = _epoch_s("MAX(ts)", d)
    return f"""
        SELECT {lo} AS min_ts_s, {hi} AS max_ts_s,
               ROUND(MIN(value), 4) AS min_value,
               ROUND(MAX(value), 4) AS max_value,
               COUNT(*) AS n
        FROM events
    """


def q_distinct_users(d: S.Dialect) -> str:
    # A8: DISTINCT per group
    return """
        SELECT event_type, COUNT(DISTINCT user_id) AS n_users
        FROM events GROUP BY event_type
    """


def q_rollup_ladder(d: S.Dialect) -> str:
    # A6 fallback-ladder analog: specific → per-nation → grand total.
    # Spark side aggregates ONCE at the finest level — (count, sum)
    # are algebraic, so the coarser rungs re-aggregate the tiny
    # (nation × priority) table instead of the fact table: GROUPING
    # SETS' Expand would push 3× the fact rows into the shuffle,
    # where this shape moves them once (measured 1.4× faster warm at
    # the 10× replica; the 3× shuffle cut is the point at scale).
    # The oracle keeps the textbook GROUPING SETS form so the two
    # derivations check each other.
    if d.name == "spark":
        # Column order (n, s, nn) is deliberate and LOAD-BEARING: it
        # makes every branch's partial-aggregate function list
        # canonically identical ([count(1), sum, count]), so AQE stage
        # reuse collapses the three base exchanges into ONE — the fact
        # join+aggregation executes once and rungs 2/3 read the reused
        # shuffle output (final plan: 2 ReusedExchange hashpartitioning,
        # one partial_count(1) stage).  With the previous (n, nn, s)
        # order rung 1 collapsed to usage order (n, s, nn), its exchange
        # no longer canonicalized equal, and the fact pass ran twice
        # (measured r12: 0.55 s -> 0.34 s at sf0.1; at scale 2 fact
        # scans -> 1).
        return """
            WITH base AS (
                SELECT n_name, o_orderpriority, COUNT(*) AS n,
                       SUM(o_totalprice) AS s,
                       COUNT(o_totalprice) AS nn
                FROM orders
                JOIN customer ON o_custkey = c_custkey
                JOIN nation ON c_nationkey = n_nationkey
                GROUP BY n_name, o_orderpriority
            ),
            lvl AS (
                SELECT n_name, o_orderpriority, n, s, nn FROM base
                UNION ALL
                SELECT n_name, CAST(NULL AS STRING), SUM(n), SUM(s),
                       SUM(nn)
                FROM base GROUP BY n_name
                UNION ALL
                -- the () grouping set emits exactly one row even on
                -- empty input, with COUNT(*) = 0 and NULL avg; the
                -- COALESCE reproduces that (SUM over no rows is NULL)
                SELECT CAST(NULL AS STRING), CAST(NULL AS STRING),
                       COALESCE(SUM(n), 0), SUM(s), COALESCE(SUM(nn), 0)
                FROM base
            )
            -- AVG divides by the NON-NULL count, so the divisor is nn
            -- (= COUNT(o_totalprice)), not n; when nn = 0, s is NULL
            -- and the quotient is NULL exactly like AVG of no values
            SELECT COALESCE(n_name, '<all>') AS nation,
                   COALESCE(o_orderpriority, '<all>') AS priority,
                   n, ROUND(s / nn, 4) AS avg_price
            FROM lvl
        """
    return """
        SELECT COALESCE(n_name, '<all>') AS nation,
               COALESCE(o_orderpriority, '<all>') AS priority,
               COUNT(*) AS n,
               ROUND(AVG(o_totalprice), 4) AS avg_price
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY GROUPING SETS ((n_name, o_orderpriority), (n_name), ())
    """


# ---------------------------------------------------------------------------
# joins (J3, J5, J6, J7)
# ---------------------------------------------------------------------------

def q_stop_pair_counts(d: S.Dialect) -> str:
    # J5: per-vehicle stop-pair counts.  The oracle keeps the textbook
    # self-join (theta < on sequence); the Spark side exploits the tiny
    # linenumber domain with SUFFICIENT STATISTICS: per order, (count,
    # sum) per linenumber in ONE aggregation, then each (i<j) pair
    # contributes n_i·n_j pairs with delta sum n_i·s_j − n_j·s_i —
    # duplicate linenumbers handled exactly.  One shuffle instead of a
    # double-sorted self-join; the hash match proves the derivations
    # equal.
    if d.name == "spark":
        # The per-order stats live in two 7-element ARRAYS; the 21
        # (i<j) pair products are then folded in a SINGLE grand-total
        # aggregate over piv (two 21-element result arrays), and the
        # constant pair table is exploded only from that one reduced
        # row.  No per-order explode: the earlier LATERAL VIEW over
        # piv generated 21x|orders| intermediate rows and tripled the
        # runtime (2.25 s -> 0.76 s at sf0.1) for identical results;
        # a grouped 42-column variant was worse still (~3 s analyzer).
        # Both shuffles survive at any scale: the orderkey exchange is
        # the one fact shuffle, and the grand total moves one row of
        # two fixed-width arrays per map partition.
        #
        # r13 (guide §2.4 "share one exchange", §2.3): the fact
        # exchange moves BEFORE the per-order fold — repartition the
        # raw (l_orderkey, l_linenumber, l_extendedprice) rows by
        # l_orderkey, so the 14 conditional sums and the 42-product
        # grand-total fold run on every core instead of inside the
        # scan task (a single-row-group local file scans as ONE task;
        # the driver's 8-vs-32-core probe needs the CPU-heavy fold to
        # live above the exchange to show scaling).  This trades away
        # map-side combine, which is right here because l_orderkey is
        # near-unique per task (~4 rows/order scattered across tasks:
        # the partial agg barely combined but widened 3 narrow columns
        # to 15 aggregate columns — the pre-partitioned shuffle moves
        # FEWER bytes at any scale, the same near-unique-domain
        # argument as ecdf_curve_jvm's pre_partition).  On a layout
        # bucketed by l_orderkey the hint would be dropped with the
        # exchange itself (see test_bucketed_aggregation_has_no_exchange).
        ks = range(1, 8)
        # primitive columns, not arrays: the grand-total fold's 42
        # SUMs over array[i]*array[j] products evaluated ~2× slower
        # than the same products over flat bigint/double columns at
        # the 100× replica (array allocation + boxed element_at per
        # row); the per-order stats stay one aggregation either way
        ns = ", ".join(
            f"SUM(IF(l_linenumber = {k}, 1, 0)) AS n{k}" for k in ks)
        ss = ", ".join(
            f"SUM(IF(l_linenumber = {k}, l_extendedprice, 0D)) AS s{k}"
            for k in ks)
        pairs = ", ".join(
            f"struct({i} AS i, {j} AS j)" for i in ks for j in ks if i < j)
        np_sums = ", ".join(
            f"SUM(n{i} * n{j})" for i in ks for j in ks if i < j)
        sd_sums = ", ".join(
            f"SUM(n{i} * s{j} - n{j} * s{i})"
            for i in ks for j in ks if i < j)
        return f"""
            WITH raw AS (
                SELECT /*+ REPARTITION(l_orderkey) */
                       l_orderkey, l_linenumber, l_extendedprice
                FROM lineitem
            ),
            piv AS (
                SELECT l_orderkey, {ns}, {ss}
                FROM raw GROUP BY l_orderkey
            ),
            red AS (
                SELECT array({np_sums}) AS nps, array({sd_sums}) AS sds
                FROM piv
            )
            SELECT p.i AS seq_from, p.j AS seq_to, nps[k] AS n_pairs,
                   ROUND(sds[k] / nps[k], 4) AS avg_price_delta
            FROM red LATERAL VIEW posexplode(array({pairs})) t AS k, p
            WHERE nps[k] > 0
        """
    return """
        SELECT a.l_linenumber AS seq_from, b.l_linenumber AS seq_to,
               COUNT(*) AS n_pairs,
               ROUND(AVG(b.l_extendedprice - a.l_extendedprice), 4) AS avg_price_delta
        FROM lineitem a
        JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey
         AND a.l_linenumber < b.l_linenumber
        GROUP BY 1, 2
    """


def q_asof_join(d: S.Dialect) -> str:
    # J3: each event matched to the newest order of the same customer
    # dated at-or-before the event (rt-file → schedule as-of rule).
    # Spark side is the union + IGNORE NULLS forward-fill form: one
    # custkey shuffle over |events| + |orders| rows, per-key sort, no
    # join — the range join's per-event fan-out (every at-or-before
    # order) never materializes.  At equal timestamps orders sort
    # before events (kind 0 < 1, the inclusive <=) and ascending okey
    # makes the carried value the max orderkey per date.  Isolated-
    # warm (full-payload sink, round 4) the fill is 3.1× faster than
    # the MAX_BY-over-range-join at sf1 (0.73 s vs 2.28 s) and 2.5×
    # at sf10 — cold in-suite BENCH rows move less because they also
    # pay per-query session/analysis cost.  The advantage grows with
    # order history depth since the fill is O(E+O) while the join is
    # O(E·matches).  The oracle keeps the windowed ANSI range-join
    # form so the two derivations check each other.
    if d.name == "spark":
        return """
            WITH u AS (
                SELECT o_custkey AS cust,
                       CAST(o_orderdate AS TIMESTAMP) AS t,
                       0 AS kind, o_orderkey AS okey,
                       CAST(NULL AS BIGINT) AS event_id
                FROM orders
                -- NULL keys/dates can never satisfy the oracle's
                -- equi/range predicates; unfiltered they would sort
                -- nulls-first and forward-fill into genuinely
                -- unmatched events
                WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
                UNION ALL
                SELECT user_id AS cust, ts AS t, 1 AS kind,
                       CAST(NULL AS BIGINT) AS okey, event_id
                FROM events
            ),
            filled AS (
                SELECT event_id, kind,
                       LAST_VALUE(okey) IGNORE NULLS OVER (
                           PARTITION BY cust ORDER BY t, kind, okey
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW
                       ) AS matched_order
                FROM u
            )
            SELECT event_id, matched_order FROM filled
            WHERE kind = 1 AND matched_order IS NOT NULL
        """
    return """
        SELECT event_id, o_orderkey AS matched_order
        FROM (
            SELECT e.event_id, o.o_orderkey,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.event_id
                       ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
                   ) AS rn
            FROM events e
            JOIN orders o
              ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        ) t
        WHERE rn = 1
    """


def q_anti_join(d: S.Dialect) -> str:
    # J7/F9: left-anti — users with events but no Realtime-analog
    # ('purchase') twin row
    return """
        SELECT DISTINCT user_id FROM events e
        WHERE NOT EXISTS (
            SELECT 1 FROM events p
            WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
              AND p.value > 140.0)
    """


def q_spatial_neighbors(d: S.Dialect) -> str:
    # J6: haversine neighbor self-join on synthesized coordinates
    # (suppliers placed on a deterministic 100x100 grid near Bremen)
    hav = S.haversine_m("a.lat", "a.lon", "b.lat", "b.lon")
    coords = """
        SELECT s_suppkey,
               53.0 + (s_suppkey % 40) * 0.002 AS lat,
               8.8 + ((s_suppkey * 7) % 40) * 0.002 AS lon
        FROM supplier
    """
    return f"""
        WITH coords AS ({coords})
        SELECT a.s_suppkey AS supp_a, b.s_suppkey AS supp_b,
               ROUND({hav}, 2) AS dist_m
        FROM coords a JOIN coords b ON a.s_suppkey < b.s_suppkey
        WHERE ROUND({hav}, 2) < 300.0
    """


# ---------------------------------------------------------------------------
# windows (W1, W2, W4 + F10)
# ---------------------------------------------------------------------------

def q_latest_wins(d: S.Dialect) -> str:
    # W2: latest time_of_recording wins per logical PK.  The ordering is
    # all-DESC, so the Spark side rewrites the window-rank as a single
    # MAX_BY over a struct ordering key: a HashAggregate with map-side
    # partial aggregation — one surviving row per key per input
    # partition enters the shuffle, vs ALL rows (sorted) for the
    # ROW_NUMBER form the oracle keeps; the cross-engine hash match
    # proves the two derivations agree.
    if d.name == "spark":
        return """
            SELECT user_id, event_type,
                   w.event_id AS latest_event,
                   ROUND(w.value, 4) AS value
            FROM (
                SELECT user_id, event_type,
                       MAX_BY(NAMED_STRUCT('event_id', event_id,
                                           'value', value),
                              NAMED_STRUCT('ts', ts,
                                           'event_id', event_id)) AS w
                FROM events
                GROUP BY user_id, event_type
            ) t
        """
    return """
        SELECT user_id, event_type, event_id AS latest_event,
               ROUND(value, 4) AS value
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY user_id, event_type
                ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) t WHERE rn = 1
    """


def q_forward_fill(d: S.Dialect) -> str:
    # W1: forward-fill the last non-null observation per vehicle
    # ('error' events carry no value → filled from the previous event)
    if d.name == "spark":
        filled = ("last(CASE WHEN event_type <> 'error' THEN value END, true) "
                  "OVER w")
    else:
        filled = ("last_value(CASE WHEN event_type <> 'error' THEN value END "
                  "IGNORE NULLS) OVER w")
    return f"""
        SELECT event_id, user_id,
               ROUND({filled}, 4) AS value_filled
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """


def q_median_rank(d: S.Dialect) -> str:
    # W3 analog: the departure board orders vehicles by their MEDIAN
    # predicted time (monitor/mod.rs:545); here per-user medians are
    # ranked with a deterministic tie-break so the ordering itself is
    # hash-verifiable (exact interpolated median in both engines)
    med = ("percentile(value, 0.5)" if d.name == "spark"
           else "quantile_cont(value, 0.5)")
    return f"""
        WITH m AS (
            SELECT user_id, ROUND({med}, 4) AS median_value,
                   COUNT(*) AS n
            FROM events GROUP BY user_id
        )
        SELECT user_id, median_value, n,
               ROW_NUMBER() OVER (
                   ORDER BY median_value DESC, user_id) AS rk
        FROM m
    """


def _hist_median(src: str, key: str, val: str, cnt: str,
                 prefix: str, d: S.Dialect) -> str:
    """CTE pair computing the exact interpolated median over a
    (key, quantized value, count) HISTOGRAM: cumulative counts give
    the order statistics without ever holding a group's raw values in
    one task (the classic sufficient-statistics median).  The two
    middle ranks for even n make ``frac`` exactly 0 or 0.5, so the
    interpolated median of integer-quantized values is an exact
    half-integer — deterministic cross-engine.  Emits
    ``{prefix}med({key}, n, med2)`` where med2 = 2 x median (kept
    doubled so it stays a BIGINT)."""
    return f"""
        {prefix}cum AS (
            SELECT {key} AS k, {val} AS v, {cnt} AS c,
                   SUM({cnt}) OVER (PARTITION BY {key} ORDER BY {val}
                       ROWS UNBOUNDED PRECEDING) AS cum,
                   SUM({cnt}) OVER (PARTITION BY {key}) AS n
            FROM {src}
        ),
        {prefix}med AS (
            SELECT k, MAX(n) AS n,
                   CAST(MIN(CASE WHEN cum >= {d.intdiv('(n + 1)', '2')}
                            THEN v END)
                        + MIN(CASE WHEN cum >= {d.intdiv('n', '2')} + 1
                              THEN v END)
                        AS BIGINT) AS med2
            FROM {prefix}cum
            GROUP BY k
        )"""


def q_mad_outliers(d: S.Dialect, k_sigma: float = 3.0) -> str:
    """Robust anomaly screen per event type: median + MAD (median
    absolute deviation) of the 1e-6-quantized values and the count of
    values beyond ``k_sigma`` · MAD — the outlier detector that
    survives the heavy tails that wreck mean/stddev z-scores (spikes
    inflate stddev until nothing is an outlier; the median pair
    doesn't move — see the masking test).

    Both medians are exact interpolated order statistics over the
    quantized-value HISTOGRAM (``_hist_median``): integer ranks from
    cumulative counts, interpolation fraction exactly 0 or 1/2 —
    every emitted number is integer-exact, nothing floats.

    Scale shape (this replaced an exact-``percentile`` form that ran
    14× behind DuckDB at sf10 and buffered an entire type's values
    in ONE aggregation task): one (type, v6) partial-aggregated fact
    pass builds the histogram; the deviation histogram is DERIVED
    from it (map + re-aggregate on the already-reduced table, no
    second fact scan); cumulative sums run per type over DISTINCT
    values with spill-safe sort-based windows.  A terabyte
    single-type stratum swaps the per-type window for the
    range-partitioned two-phase rank of
    ``equidepth_histogram_scale`` — same arithmetic."""
    return f"""
        WITH vals AS (
            SELECT event_type,
                   CAST(ROUND(value * 1e6) AS BIGINT) AS v6
            FROM events WHERE value IS NOT NULL
        ),
        hist AS (
            SELECT event_type, v6, COUNT(*) AS c
            FROM vals GROUP BY event_type, v6
        ),
        {_hist_median('hist', 'event_type', 'v6', 'c', 'v', d)},
        dev AS (
            SELECT h.event_type,
                   ABS(2 * h.v6 - m.med2) AS d6x2, SUM(h.c) AS c
            FROM hist h JOIN vmed m ON m.k = h.event_type
            GROUP BY h.event_type, ABS(2 * h.v6 - m.med2)
        ),
        {_hist_median('dev', 'event_type', 'd6x2', 'c', 'd', d)},
        oc AS (
            -- dev > k*MAD with dev = d6x2/2 and MAD = dmed.med2/4:
            -- 2*d6x2 > k*med2, x10 to keep one-decimal k integral
            SELECT h.event_type,
                   CAST(SUM(CASE WHEN 20 * ABS(2 * h.v6 - m.med2)
                                      > CAST({int(round(k_sigma * 10))}
                                             AS BIGINT) * s.med2
                                 THEN h.c ELSE 0 END) AS BIGINT)
                       AS n_outliers
            FROM hist h
            JOIN vmed m ON m.k = h.event_type
            JOIN dmed s ON s.k = h.event_type
            GROUP BY h.event_type
        )
        SELECT m.k AS event_type, CAST(m.n AS BIGINT) AS n,
               CAST(m.med2 AS BIGINT) AS med_e6_x2,
               CAST(s.med2 AS BIGINT) AS mad_e6_x4,
               oc.n_outliers,
               CAST(ROUND(1e4 * CAST(oc.n_outliers AS DOUBLE)
                          / CAST(m.n AS DOUBLE)) AS BIGINT)
                   AS outlier_share_e4
        FROM vmed m
        JOIN dmed s ON s.k = m.k
        JOIN oc ON oc.event_type = m.k
        ORDER BY event_type
    """


def q_sessionization(d: S.Dialect, gap_s: int = 1800) -> str:
    """Gap-based sessionization: consecutive events of a user belong
    to one session while the gap stays under ``gap_s``; session ids
    are the running count of gap-breaks (the classic LAG → flag →
    cumulative-sum rewrite — no iteration, no UDF).  Per session:
    bounds, event count, value sum.

    Scale shape: both windows partition by user_id, so the whole
    derivation is ONE user-keyed shuffle; the per-session rollup
    re-uses the same partitioning.  This is the batch twin of a
    Structured Streaming ``session_window`` aggregation — the driver
    verifies the batch semantics the stream must converge to.
    """
    ep = _epoch_s("ts", d)
    return f"""
        WITH ordered AS (
            SELECT user_id, ts, event_id, value, {ep} AS ep,
                   LAG({ep}) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_ep
            FROM events
        ),
        flagged AS (
            SELECT user_id, ts, event_id, value, ep,
                   CASE WHEN prev_ep IS NULL
                             OR ep - prev_ep > {gap_s}
                        THEN 1 ELSE 0 END AS brk
            FROM ordered
        ),
        sessions AS (
            SELECT user_id, value, ep,
                   SUM(brk) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS session_id
            FROM flagged
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               MIN(ep) AS start_ep, MAX(ep) AS end_ep,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(SUM(value), 4) AS value_sum
        FROM sessions
        GROUP BY user_id, session_id
    """


def q_funnel_steps(d: S.Dialect) -> str:
    """Ordered 3-step funnel (view → click → purchase) per user: the
    earliest view, the earliest click AFTER that view, the earliest
    purchase AFTER that click, and how deep the user got.  Expressed
    as conditional MINs over one per-user aggregation pass per step —
    three user-keyed aggregations that AQE plans as consecutive
    same-key shuffles (effectively one repartition); no self-join of
    the event log against itself.

    Scale shape: each step's input is the (tiny) per-user step-time
    table joined back broadcast-style to the event stream; candidate
    volume is |events| per step, never |events|² — the standard
    funnel rewrite that avoids the naive 3-way event self-join.

    Tie semantics: steps compare on whole-second epochs (>=), so a
    click in the SAME second as the view counts as after it, and any
    sub-second ordering in ``ts`` is deliberately discarded — the
    coarsest cross-engine-stable resolution (DuckDB keeps micros,
    Spark's unix_timestamp truncates; comparing full-resolution
    timestamps would hash-diverge).  Funnel order is therefore
    second-granular by construction.
    """
    ep = _epoch_s("ts", d)
    return f"""
        WITH ev AS (
            SELECT user_id, event_type, {ep} AS ep FROM events
            WHERE event_type IN ('view', 'click', 'purchase')
        ),
        s1 AS (
            SELECT user_id, MIN(ep) AS t_view FROM ev
            WHERE event_type = 'view' GROUP BY user_id
        ),
        s2 AS (
            SELECT e.user_id, MIN(e.ep) AS t_click
            FROM ev e JOIN s1 ON s1.user_id = e.user_id
            WHERE e.event_type = 'click' AND e.ep >= s1.t_view
            GROUP BY e.user_id
        ),
        s3 AS (
            SELECT e.user_id, MIN(e.ep) AS t_purchase
            FROM ev e JOIN s2 ON s2.user_id = e.user_id
            WHERE e.event_type = 'purchase' AND e.ep >= s2.t_click
            GROUP BY e.user_id
        )
        SELECT s1.user_id, s1.t_view, s2.t_click, s3.t_purchase,
               CAST(CASE WHEN s3.user_id IS NOT NULL THEN 3
                         WHEN s2.user_id IS NOT NULL THEN 2
                         ELSE 1 END AS INT) AS steps_completed
        FROM s1
        LEFT JOIN s2 ON s2.user_id = s1.user_id
        LEFT JOIN s3 ON s3.user_id = s1.user_id
    """


def q_rolling_hour_avg(d: S.Dialect) -> str:
    """Per-user trailing-1-hour rolling mean over the event stream: a
    RANGE frame on whole-second epochs (integer bounds — identical
    frames cross-engine, no interval-type drift).  One user-keyed
    shuffle; the frame scan is linear per partition (Spark keeps a
    sliding aggregate, not a re-scan per row)."""
    ep = _epoch_s("ts", d)
    return f"""
        WITH ev AS (
            SELECT event_id, user_id, value, {ep} AS ep FROM events
            WHERE value IS NOT NULL
        )
        SELECT event_id, user_id, ep,
               ROUND(AVG(value) OVER (
                   PARTITION BY user_id ORDER BY ep
                   RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 4)
                   AS avg_1h,
               CAST(COUNT(*) OVER (
                   PARTITION BY user_id ORDER BY ep
                   RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS n_1h
        FROM ev
    """


def q_scd2_intervals(d: S.Dialect) -> str:
    """SCD Type-2 interval build from a change stream: collapse each
    user's consecutive runs of the same event_type into validity
    intervals [valid_from, valid_to) with valid_to = the next run's
    start (NULL while current).  LAG detects the change, a cumulative
    sum numbers the runs, LEAD closes them — one user-keyed shuffle,
    no self-join, the standard latest-wins→history upgrade of the
    W2/S12 merge family."""
    ep = _epoch_s("ts", d)
    return f"""
        WITH ordered AS (
            SELECT user_id, event_type, {ep} AS ep,
                   CASE WHEN LAG(event_type) OVER (
                            PARTITION BY user_id
                            ORDER BY ts, event_id) IS DISTINCT FROM
                            event_type
                        THEN 1 ELSE 0 END AS chg,
                   ts, event_id
            FROM events
        ),
        runs AS (
            SELECT user_id, event_type, ep,
                   SUM(chg) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS run_id
            FROM ordered
        ),
        intervals AS (
            SELECT user_id, event_type,
                   CAST(run_id AS BIGINT) AS run_id,
                   MIN(ep) AS valid_from,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM runs GROUP BY user_id, event_type, run_id
        )
        SELECT user_id, event_type, run_id, valid_from,
               LEAD(valid_from) OVER (PARTITION BY user_id
                                      ORDER BY run_id) AS valid_to,
               n_events
        FROM intervals
    """


def q_retention_cohorts(d: S.Dialect) -> str:
    """Cohort retention matrix: users grouped by first-seen day, and
    for each (cohort_day, day_offset) the distinct users active that
    day plus the retention rate against the cohort size.

    Scale shape: first-seen is one user-keyed MIN aggregation; the
    activity table pre-collapses to DISTINCT (user, day) before the
    join (so the join input is bounded by users × active-days, not raw
    events); cohort sizes are a tiny broadcast side.  Day arithmetic
    stays in integer epoch-days — identical cross-engine, no
    date-diff dialect drift."""
    ep = _epoch_s("ts", d)
    day = f"CAST(FLOOR({ep} / 86400.0) AS BIGINT)"
    return f"""
        WITH activity AS (
            SELECT DISTINCT user_id, {day} AS day FROM events
        ),
        first_seen AS (
            SELECT user_id, MIN(day) AS cohort_day
            FROM activity GROUP BY user_id
        ),
        cohort_sizes AS (
            SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS cohort_n
            FROM first_seen GROUP BY cohort_day
        ),
        cells AS (
            SELECT f.cohort_day, a.day - f.cohort_day AS day_offset,
                   CAST(COUNT(*) AS BIGINT) AS active_n
            FROM activity a
            JOIN first_seen f ON f.user_id = a.user_id
            GROUP BY f.cohort_day, a.day - f.cohort_day
        )
        SELECT c.cohort_day, c.day_offset, c.active_n, s.cohort_n,
               ROUND(CAST(c.active_n AS DOUBLE) / s.cohort_n, 4)
                   AS retention
        FROM cells c
        JOIN cohort_sizes s ON s.cohort_day = c.cohort_day
    """


def q_non_final_stops(d: S.Dialect) -> str:
    # W4 + F10: drop each trip's final stop via per-trip max(sequence)
    return """
        SELECT l_orderkey, l_linenumber
        FROM (
            SELECT l_orderkey, l_linenumber,
                   MAX(l_linenumber) OVER (PARTITION BY l_orderkey) AS max_ln
            FROM lineitem
        ) t WHERE l_linenumber < max_ln
    """


# ---------------------------------------------------------------------------
# filters / scalar classification (C4, C5, F3, S8, O3)
# ---------------------------------------------------------------------------

def q_time_slot_histogram(d: S.Dialect) -> str:
    slot = S.time_slot_id("ts", d)
    return f"""
        SELECT {slot} AS time_slot, event_type, COUNT(*) AS n,
               ROUND(AVG(value), 4) AS avg_value
        FROM events GROUP BY 1, 2
    """


def q_route_sections(d: S.Dialect) -> str:
    sec = S.route_section("l_linenumber - 1", "cnt", d)
    return f"""
        WITH counted AS (
            SELECT l_orderkey, l_linenumber,
                   COUNT(*) OVER (PARTITION BY l_orderkey) AS cnt,
                   l_quantity
            FROM lineitem
        )
        SELECT {sec} AS route_section, COUNT(*) AS n,
               ROUND(AVG(l_quantity), 4) AS avg_qty
        FROM counted GROUP BY 1
    """


def q_delay_rounding(d: S.Dialect) -> str:
    # F3: 12 s rounding with trunc-toward-zero on signed deltas
    delay = d.trunc_num("(value - 50.0) * 10.0")
    rounded = S.round_to_12s(delay, d)
    return f"""
        SELECT {rounded} AS delay_bucket, COUNT(*) AS n
        FROM events GROUP BY 1
    """


def q_interval_overlap(d: S.Dialect) -> str:
    # S8: prediction_min < window_max AND prediction_max > window_min
    lo = _epoch_s("ts", d)
    return f"""
        SELECT event_id, {lo} AS start_s
        FROM events
        WHERE {lo} < 1704240000 + 7200
          AND {lo} + CAST(value * 60 AS BIGINT) > 1704240000
    """


def q_autocomplete(d: S.Dialect) -> str:
    # O3/F12: term-contains filter, sorted distinct top-10
    return """
        SELECT DISTINCT c_name FROM customer
        WHERE LOWER(c_name) LIKE '%19%'
        ORDER BY c_name
        LIMIT 10
    """


def q_union_service_days(d: S.Dialect) -> str:
    # U1: today ∪ yesterday trip sets (>24h start times span days) —
    # tagged union of two day windows
    return """
        SELECT 'today' AS service_day, event_id, user_id FROM events
        WHERE CAST(ts AS DATE) = DATE '2024-01-02'
        UNION ALL
        SELECT 'yesterday' AS service_day, event_id, user_id FROM events
        WHERE CAST(ts AS DATE) = DATE '2024-01-01'
    """


def q_latest_in_past(d: S.Dialect) -> str:
    # O7/S11: per user, the most recent event strictly before a cutoff
    # (ORDER BY time DESC, tie-break, take 1).  All-DESC ordering, so
    # the Spark side uses the partial-aggregating MAX_BY rewrite (see
    # q_latest_wins); the cutoff filter additionally pushes down to
    # the parquet scan, which the window form also enjoys — the win
    # here is shuffling one row per user per partition.
    if d.name == "spark":
        return """
            SELECT user_id, w.event_id AS latest_event, w.event_type
            FROM (
                SELECT user_id,
                       MAX_BY(NAMED_STRUCT('event_id', event_id,
                                           'event_type', event_type),
                              NAMED_STRUCT('ts', ts,
                                           'event_id', event_id)) AS w
                FROM events
                WHERE ts < TIMESTAMP '2024-01-15 00:00:00'
                GROUP BY user_id
            ) t
        """
    return """
        SELECT user_id, event_id AS latest_event, event_type
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY user_id
                ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
            WHERE ts < TIMESTAMP '2024-01-15 00:00:00'
        ) t WHERE rn = 1
    """


def q_orders_by_size(d: S.Dialect) -> str:
    # O6: variants sorted by stop count descending (deterministic
    # tie-break), top 10
    return """
        SELECT l_orderkey, COUNT(*) AS n_lines
        FROM lineitem GROUP BY 1
        ORDER BY n_lines DESC, l_orderkey ASC
        LIMIT 10
    """


def q_trip_resolution(d: S.Dialect) -> str:
    # J8 analog: resolve (segment, priority, day) descriptors to one
    # concrete order — multi-key join + "first match wins" min
    return """
        SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority,
               CAST(o.o_orderdate AS DATE) AS day,
               MIN(o.o_orderkey) AS resolved_order
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2, 3
    """


def q_noon_datetime(d: S.Dialect) -> str:
    # C1/C2: noon-anchored GTFS datetime incl. times past 24:00
    secs = "CAST(o_orderkey % 100000 AS INT)"
    expr = S.gtfs_noon_datetime("CAST(o_orderdate AS DATE)", secs)
    ep = _epoch_s(expr, d)
    return f"""
        SELECT o_orderkey, {ep} AS event_epoch_s
        FROM orders
    """


def q_contiguous_trips(d: S.Dialect) -> str:
    # C20 analog: is the stop list a contiguous window (no gaps in
    # sequence numbers, no repeats)?
    return """
        SELECT l_orderkey,
               CAST(MAX(l_linenumber) - MIN(l_linenumber) + 1
                    = COUNT(DISTINCT l_linenumber) AS INT) AS is_contiguous,
               COUNT(*) AS n_stops
        FROM lineitem GROUP BY 1
    """


def q_value_percentiles(d: S.Dialect) -> str:
    # C11 relational flavor: exact interpolated percentiles per group
    if d.name == "spark":
        pct = "percentile(value, {p})"
    else:
        pct = "quantile_cont(value, {p})"
    cols = ", ".join(
        f"ROUND({pct.format(p=p)}, 4) AS p{int(p * 100):02d}"
        for p in (0.05, 0.25, 0.5, 0.75, 0.95))
    return f"SELECT event_type, {cols} FROM events GROUP BY event_type"


# ---------------------------------------------------------------------------
# text analysis + dedup (beyond-reference operators)
# ---------------------------------------------------------------------------

def q_token_stats(d: S.Dialect) -> str:
    tc = S.token_count("text", d)
    bpe = S.bpe_token_count("text", d)
    return f"""
        SELECT doc_id, {tc} AS n_tokens,
               CAST({bpe} AS BIGINT) AS n_bpe_tokens,
               LENGTH(text) AS n_chars_actual
        FROM documents
    """


def q_lang_id(d: S.Dialect) -> str:
    # stage each language's marker score ONCE in a FROM-level
    # projection, then argmax over the columns: inlined, the CASE
    # re-evaluates the pad-and-REPLACE score chains per comparison
    # (up to 18 evaluations/row; guide §4.1) — Spark keeps the two
    # Projects separate (CollapseProject refuses to duplicate
    # non-cheap multiply-referenced expressions) and DuckDB
    # materializes the projection, so both engines score each
    # language exactly once per document
    scores = ", ".join(
        f"{S.lang_score('text', lang)} AS s_{lang}"
        for lang, _ in S.LANG_MARKERS)
    case = S.lang_id_case({lang: f"s_{lang}" for lang, _ in S.LANG_MARKERS})
    return f"""
        SELECT doc_id, {case} AS lang_pred
        FROM (SELECT doc_id, {scores} FROM documents)
    """


# r13 measured NEGATIVE (guide §1.3 "when to stop"): a conditional
# spread of (doc_id, text) before the score projection (the
# `_bigram_lm_spark` splits<cores branch) won on the computation
# alone — interleaved same-session noop A/B 0.231 → 0.193 s median —
# but the declared bench action is build + count(), and count()
# PRUNES a map-only projection (the score chains never execute in
# the timed region), so the spread's shuffle and the per-build
# splits probe are pure added cost on the driver's metric: bench row
# 0.139 → 0.438 s.  Reverted to the plain SQL pair; the spread
# pattern stays on paths whose timed action evaluates the columns
# (stop_pair_counts pre-partition, _bigram_lm_spark).


def q_quality_score(d: S.Dialect) -> str:
    q = S.quality_score("text", d)
    return f"""
        SELECT doc_id, {q} AS quality FROM documents
    """


def q_quality_gate(d: S.Dialect) -> str:
    """Composite keep/drop decision over the text-quality signal
    family — the gate an LLM-data pipeline actually runs, composed
    from the individually-verified signals (lang_id, quality_score,
    token counts, Gopher-style top-token repetition): a document is
    kept only when every gate passes, and the reason bitmask says
    which gates fired (1=too short, 2=low quality, 4=repetitive,
    8=unsupported language) so downstream can audit drop rates per
    reason and per source.

    Thresholds sit at the sf0.01 distribution's tails (p10 token
    count, p10 quality, p90 top-token fraction) so every gate is
    exercised by the driver data.  Scale shape: the signals are
    map-only scalar expressions plus ONE doc-keyed token aggregation
    — no joins beyond the doc_id-co-keyed signal merge, no corpus-
    wide state."""
    return f"""
        WITH sig AS (
            SELECT doc_id, source,
                   {S.lang_id('text')} AS lang_pred,
                   {S.quality_score('text', d)} AS quality,
                   {d.arr_len(d.token_array('text'))} AS n_tok
            FROM documents
        ),
        tok AS (
            SELECT doc_id, {d.explode_tokens('text')} AS tk
            FROM documents
        ),
        tc AS (
            SELECT doc_id, tk, COUNT(*) AS c FROM tok GROUP BY doc_id, tk
        ),
        rep AS (
            SELECT doc_id,
                   ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 4)
                       AS top_tok_frac
            FROM tc GROUP BY doc_id
        ),
        gated AS (
            SELECT s.doc_id, s.source, s.lang_pred, s.quality,
                   s.n_tok, r.top_tok_frac,
                   (CASE WHEN s.n_tok < 21 THEN 1 ELSE 0 END
                    + CASE WHEN s.quality < 0.45 THEN 2 ELSE 0 END
                    + CASE WHEN r.top_tok_frac > 0.14 THEN 4 ELSE 0 END
                    + CASE WHEN s.lang_pred NOT IN ('en', 'de')
                           THEN 8 ELSE 0 END) AS drop_reasons
            FROM sig s JOIN rep r ON r.doc_id = s.doc_id
        )
        SELECT doc_id, source, lang_pred, quality,
               CAST(n_tok AS BIGINT) AS n_tok, top_tok_frac,
               CAST(drop_reasons AS INT) AS drop_reasons,
               CAST(CASE WHEN drop_reasons = 0 THEN 1 ELSE 0 END
                    AS INT) AS kept
        FROM gated
    """


def q_doc_chunking(d: S.Dialect) -> str:
    """Fixed-size overlapping chunker — the splitter a training
    pipeline runs before embedding/packing: 80-char windows on a
    60-char stride (size > stride ⇒ 20-char overlap), short documents
    yielding exactly one chunk.  Emits the chunk's id, length, and
    content hash so the driver hash-verifies the actual chunk bytes
    without shipping them.

    Scale shape: map-only — one generator expression per document
    (``explode(sequence(0, n_chunks-1))``) and a substring per chunk;
    no shuffle at all, so it pipelines into whatever consumes the
    chunks.  Token-budget chunkers swap LENGTH/SUBSTRING for the
    token-array analogs (``d.arr_len``/``d.arr_slice_join``) with the
    same plan shape."""
    n_chunks = "CAST(CEIL(GREATEST(LENGTH(text) - 80, 0) / 60.0) AS INT) + 1"
    return f"""
        WITH chunks AS (
            SELECT doc_id,
                   {d.explode_range(n_chunks)} AS chunk_id,
                   text
            FROM documents
        )
        SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
               LENGTH(SUBSTRING(text, chunk_id * 60 + 1, 80))
                   AS n_chunk_chars,
               MD5(SUBSTRING(text, chunk_id * 60 + 1, 80)) AS chunk_hash
        FROM chunks
    """


def q_posting_lists(d: S.Dialect) -> str:
    """Positional inverted index over the corpus: one row per
    (token, document) with the ordered 0-based token positions
    (CSV-rendered: array cells crash the driver's pandas
    canonicalizer, and arrays hash engine-dependently) — the
    posting representation phrase search and span lookup need.  Every
    row is bounded by a single document's length (whole-corpus
    doc-list rows would concentrate the df-heavy tokens into
    arbitrarily large cells; per-doc rows never do), and the
    token-level df/doc-list view is one further ``GROUP BY token``
    away when a consumer wants it.

    Scale shape: map-only tokenize + position explode, then ONE
    (token, doc_id)-keyed aggregate — partial aggregation compacts
    each document's positions map-side since a document's tokens live
    in one input split.  At lake scale the output lands
    ``repartitionByRange(token)`` so each file is a contiguous
    dictionary range."""
    pos = f"""
            SELECT doc_id, {d.arr_get('ta', 'i')} AS token,
                   CAST(i AS INT) AS i
            FROM (
                SELECT doc_id, ta,
                       {d.explode_range(d.arr_len('ta'))} AS i
                FROM (
                    SELECT doc_id, {d.token_array('text')} AS ta
                    FROM documents
                ) AS arrs
            ) AS idx
    """
    return f"""
        WITH pos AS ({pos})
        SELECT token, doc_id, CAST(COUNT(*) AS BIGINT) AS n_occ,
               {d.ordered_list_csv('i', 'i')} AS positions_csv
        FROM pos GROUP BY token, doc_id
    """


def q_pmi_pairs(d: S.Dialect) -> str:
    """Within-document co-occurrence PMI — the collocation signal
    phrase mining and tokenizer-merge audits run over a corpus:
    ``pmi(x,y) = ln(P(x,y) / (P(x)·P(y)))`` with document-level
    presence probabilities, reported for pairs seen in ≥ 5 documents.
    The PMI lands as integer micro-nats (×1e6, BIGINT) so no float
    representation reaches the driver hash.

    Scale shape: the pair generator is the guarded quadratic — distinct
    tokens per document self-joined with ``t1 < t2`` — which is
    O(tokens²) per DOCUMENT, not per corpus, and the token-df band
    (5 ≤ df) prunes the vocabulary before the join via a broadcast-
    sized filter table.  One extra corpus scan computes N; everything
    else is token- or pair-keyed partial aggregation."""
    return f"""
        WITH toks AS (
            SELECT DISTINCT doc_id, tk FROM (
                SELECT doc_id, {d.explode_tokens('text')} AS tk
                FROM documents
            ) AS raw
            WHERE tk <> ''
        ),
        df AS (
            SELECT tk, COUNT(*) AS c FROM toks GROUP BY tk
            HAVING COUNT(*) >= 5
        ),
        keep AS (
            SELECT t.doc_id, t.tk, d.c FROM toks t
            JOIN df d ON d.tk = t.tk
        ),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        pairs AS (
            SELECT a.tk AS t1, b.tk AS t2,
                   a.c AS c1, b.c AS c2, COUNT(*) AS c_xy
            FROM keep a JOIN keep b
              ON a.doc_id = b.doc_id AND a.tk < b.tk
            GROUP BY a.tk, b.tk, a.c, b.c
            HAVING COUNT(*) >= 5
        )
        SELECT t1, t2, CAST(c_xy AS BIGINT) AS c_xy,
               CAST(ROUND(LN(CAST(c_xy AS DOUBLE) * n_docs
                             / (CAST(c1 AS DOUBLE) * c2)) * 1e6)
                    AS BIGINT) AS pmi_micronats
        FROM pairs CROSS JOIN n
    """


def q_token_entropy(d: S.Dialect) -> str:
    """Shannon token entropy per document — the information-density
    quality signal (low entropy ⇒ repetitive/template text):
    H = ln(n) − Σ c·ln(c) / n over per-doc token counts.  The float
    sum Σ c·ln(c) would be engine-order-dependent as a plain SUM, so
    it runs as a LEFT-ASSOCIATED fold (``arr_fsum``) over the counts
    ordered by token — identical element order and identical IEEE ops
    on both engines make the double, and hence the micro-nat output,
    bit-identical (the `hll_distinct`/`temperature_sample` trick).

    Scale shape: one (doc, token) count aggregate, one doc-keyed
    collect of the per-doc distinct-token counts (bounded by the
    vocabulary a single document can contain) — no corpus state."""
    fold = d.arr_fsum(d.ordered_list("CAST(c AS DOUBLE) * LN(c)", "tk"))
    return f"""
        WITH tc AS (
            SELECT doc_id, tk, COUNT(*) AS c FROM (
                SELECT doc_id, {d.explode_tokens('text')} AS tk
                FROM documents
            ) AS raw
            WHERE tk <> ''
            GROUP BY doc_id, tk
        )
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tok,
               CAST(COUNT(*) AS BIGINT) AS n_distinct,
               CAST(ROUND((LN(SUM(c)) - {fold} / SUM(c)) * 1e6)
                    AS BIGINT) AS entropy_micronats
        FROM tc GROUP BY doc_id
    """


def q_sparse_cosine_pairs(d: S.Dialect) -> str:
    """Sparse-vector cosine similarity join via an inverted index —
    the way near-dup detection over TF vectors actually runs at lake
    scale: a (term, doc, tf) index self-joined per TERM generates
    partial products only for co-occurring terms, so candidate volume
    is Σ_term df² (df-capped), never |docs|².  Terms are word bigrams
    (the unigram vocabulary is degenerate in this corpus); weights
    are raw integer term frequencies, which keeps every aggregate —
    dot products and squared norms — an EXACT integer sum.  The one
    float step (dot / √(ss1·ss2), IEEE-exact sqrt and divide on
    integer inputs) happens identically per output row on both
    engines, so the 6-decimal cosine is hash-stable by construction
    rather than by ulp luck.

    Scale shape: tokenize once, one (term, doc) aggregate, one
    term-keyed self-join with the df ≤ 100 stop-term cap (the PPJoin
    prefix filter's blunt cousin; at 100 TB the cap is what stops
    'the the' from generating 10¹⁴ candidate pairs), one pair-keyed
    sum.  Emits pairs with cosine ≥ 0.5."""
    return f"""
        WITH ta AS (
            SELECT doc_id, {d.token_array('text')} AS ta FROM documents
        ),
        terms AS (
            SELECT doc_id, {d.explode_arr(d.bigram_list('ta'))} AS term
            FROM ta
        ),
        tf AS (
            SELECT doc_id, term, COUNT(*) AS tf
            FROM terms GROUP BY doc_id, term
        ),
        df AS (
            SELECT term, COUNT(*) AS df FROM tf GROUP BY term
            HAVING COUNT(*) <= 100
        ),
        idx AS (
            SELECT t.term, t.doc_id, t.tf FROM tf t
            JOIN df USING (term)
        ),
        norms AS (
            SELECT doc_id, SUM(tf * tf) AS ss
            FROM idx GROUP BY doc_id
        ),
        dots AS (
            SELECT a.doc_id AS d1, b.doc_id AS d2,
                   SUM(a.tf * b.tf) AS dot
            FROM idx a JOIN idx b
              ON a.term = b.term AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT d1, d2, CAST(dot AS BIGINT) AS dot,
               CAST(ROUND(CAST(dot AS DOUBLE)
                          / SQRT(CAST(n1.ss AS DOUBLE)
                                 * CAST(n2.ss AS DOUBLE)) * 1e6)
                    AS BIGINT) AS cos_micro
        FROM dots
        JOIN norms n1 ON n1.doc_id = d1
        JOIN norms n2 ON n2.doc_id = d2
        WHERE CAST(dot AS DOUBLE)
              / SQRT(CAST(n1.ss AS DOUBLE) * CAST(n2.ss AS DOUBLE)) >= 0.5
    """


def q_equidepth_histogram(d: S.Dialect) -> str:
    """Equi-DEPTH histogram of order totals (the planner-statistics
    twin of the sketch family's equi-width `histogram_quantiles`):
    NTILE(16) splits the ordered value stream into equal-count
    buckets and each bucket reports its bounds and mass.  Bounds are
    input values, never computed floats, so the hash sees only data
    the parquet file already contains.

    Scale shape: a global NTILE is a single-partition sort at 100 TB —
    the scale form ranks via a two-phase percent_rank equivalent
    (bucket = floor(16 · (rank-1)/n), rank from a range-partitioned
    sort, Spark's repartitionByRange + per-partition offsets); NTILE
    and the rank form agree exactly when n % 16 handling matches,
    which the tie-break (orderkey) pins.  At sf scale the window form
    is the honest measured path and the oracle twin."""
    return """
        WITH ranked AS (
            SELECT o_totalprice,
                   NTILE(16) OVER (
                       ORDER BY o_totalprice, o_orderkey
                   ) AS bucket
            FROM orders
        )
        SELECT CAST(bucket AS INT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n,
               MIN(o_totalprice) AS lo,
               MAX(o_totalprice) AS hi
        FROM ranked GROUP BY bucket
    """


def q_pagerank_iter2(d: S.Dialect) -> str:
    """Two unrolled iterations of the FIXED-POINT PageRank spec
    (`operators/graph.py::pagerank`) over the customer→supplier
    purchase graph — suppliers are pure sinks, so the dangling-mass
    path is exercised, not just the inflow sum.  Node ids are
    namespaced (cust·2 / supp·2+1) because the key spaces overlap.

    Every quantity is an exact integer (ranks in 10^12-units, damping
    as ·85 DIV 100), so the cross-engine hash pins the operator's
    bit-identical-result claim rather than hoping float sums agree.
    The registered Spark side runs the ITERATIVE OPERATOR; this SQL is
    the independent derivation."""
    SC = 10 ** 12
    dv = d.intdiv
    it = lambda rprev: f"""
            sh_{rprev} AS (
                SELECT {rprev}.n AS s, {dv(f'{rprev}.r', 'deg.dg')} AS sh
                FROM {rprev} JOIN deg ON deg.s = {rprev}.n
            ),
            in_{rprev} AS (
                SELECT e.d AS n, SUM(sh) AS m
                FROM e JOIN sh_{rprev} ON sh_{rprev}.s = e.s
                GROUP BY e.d
            ),
            dang_{rprev} AS (
                SELECT COALESCE(SUM({rprev}.r), 0) AS dm
                FROM {rprev} LEFT JOIN deg ON deg.s = {rprev}.n
                WHERE deg.s IS NULL
            )
    """
    step = lambda rprev: (
        f"SELECT nodes.n, {dv(f'15 * {SC}', '100 * nn.cnt')} + "
        + dv(f"85 * (COALESCE(in_{rprev}.m, 0) + "
             + dv(f'dang_{rprev}.dm', 'nn.cnt') + ")", "100")
        + f""" AS r
            FROM nodes CROSS JOIN nn CROSS JOIN dang_{rprev}
            LEFT JOIN in_{rprev} ON in_{rprev}.n = nodes.n""")
    return f"""
        WITH e AS (
            SELECT DISTINCT o.o_custkey * 2 AS s, l.l_suppkey * 2 + 1 AS d
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        ),
        nodes AS (SELECT s AS n FROM e UNION SELECT d AS n FROM e),
        nn AS (SELECT COUNT(*) AS cnt FROM nodes),
        deg AS (SELECT s, COUNT(*) AS dg FROM e GROUP BY s),
        r0 AS (
            SELECT n, {dv(str(SC), 'cnt')} AS r FROM nodes CROSS JOIN nn
        ),
        {it('r0')},
        r1 AS ({step('r0')}),
        {it('r1')},
        r2 AS ({step('r1')})
        SELECT n AS node, CAST(r AS BIGINT) AS rank_fp FROM r2
    """


def _pagerank_iter2_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The iterative operator itself (n_iter=2) — hash-matched against
    the unrolled SQL derivation above, cross-engine."""
    from ..operators.graph import pagerank
    from ..session import configure_for_oracle

    configure_for_oracle(spark)
    register_views(spark, sf_dir)
    import pyspark.sql.functions as F

    edges = spark.sql("""
        SELECT DISTINCT o.o_custkey * 2 AS s, l.l_suppkey * 2 + 1 AS d
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    """)
    return (pagerank(edges, "s", "d", n_iter=2)
            .select("node", F.col("rank_fp").cast("long").alias("rank_fp")))


_SUFFIX_RANKS_ORACLE = """
    WITH ta AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), ' +'),
                           t -> t <> '') AS ta
        FROM documents
    ),
    pos AS (SELECT doc_id, unnest(range(len(ta))) AS i, ta FROM ta)
    SELECT doc_id, CAST(i AS INT) AS pos,
           CAST(DENSE_RANK() OVER (ORDER BY ta[i+1:]) AS BIGINT)
               AS suffix_rank
    FROM pos
"""


def _suffix_ranks_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide token-suffix ranking by distributed prefix doubling
    (`operators/suffix.py::suffix_ranks` — the ExactSubstr dedup
    index), hash-matched against DuckDB sorting the MATERIALIZED
    suffix lists directly: two maximally-different derivations of the
    same integer ranks.  The oracle's direct sort only a toy corpus
    can afford; the operator's doubling rounds are the published
    lake-scale construction (Flick & Aluru SC'15)."""
    from ..operators.suffix import suffix_ranks
    from ..session import configure_for_oracle

    configure_for_oracle(spark)
    register_views(spark, sf_dir)
    return suffix_ranks(spark.table("documents"))


def _equidepth_scale_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB derivation of `equidepth_histogram`: the global sort
    NTILE needs becomes a two-phase range-partitioned rank
    (`operators/suffix.dense_rank_scalable` over the UNIQUE
    (o_totalprice, o_orderkey) tuples — unique keys make dense rank a
    row number), and NTILE's remainder rule is reproduced exactly in
    closed form: the first n % 16 buckets hold ⌈n/16⌉ rows, the rest
    ⌊n/16⌋.  Hash-matched against DuckDB actually running NTILE —
    the window's semantics pinned against the shuffle-parallel form
    that never serializes the corpus through one task."""
    import pyspark.sql.functions as F

    from ..operators.suffix import dense_rank_scalable
    from ..session import configure_for_oracle

    configure_for_oracle(spark)
    register_views(spark, sf_dir)
    orders = spark.table("orders").select("o_totalprice", "o_orderkey")
    ranked = dense_rank_scalable(orders, ["o_totalprice", "o_orderkey"],
                                 out="rn")
    n = orders.count()
    k = 16
    big, n_big = -(-n // k), n % k  # ceil size, number of big buckets
    cut = big * n_big
    small = n // k
    bucket = F.when(
        F.col("rn") <= cut, (F.col("rn") - 1) / big
    ).otherwise(n_big + (F.col("rn") - cut - 1) / F.lit(max(small, 1)))
    return (ranked
            .withColumn("bucket", F.floor(bucket).cast("int") + 1)
            .groupBy("bucket")
            .agg(F.count("*").cast("long").alias("n"),
                 F.min("o_totalprice").alias("lo"),
                 F.max("o_totalprice").alias("hi"))
            .select(F.col("bucket").cast("int").alias("bucket"),
                    "n", "lo", "hi"))


# DuckDB-side repeated-span profile CTE chain (direct suffix sort —
# the toy-affordable cross-derivation of operators/suffix's prefix
# doubling).  Ends with prof(doc_id, pos, rep_len), rep_len >= min_len;
# shared by the repeated_spans profile query and the ExactSubstr cut.
# ``cap`` truncates every suffix to its first ``cap`` tokens before
# ranking/LCP (the document-length-independent profile: rep_len
# becomes min(true, cap) pointwise — see _exactsubstr_cut_capped).
def _suffix_profile_oracle_ctes(min_len: int = 8,
                                cap: int | None = None) -> str:
    s_expr = f"ta[i+1:]" if cap is None else f"ta[i+1:i+{cap}]"
    return f"""
    ta AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), ' +'),
                           t -> t <> '') AS ta
        FROM documents
    ),
    pos AS (SELECT doc_id, unnest(range(len(ta))) AS i, ta FROM ta),
    sfx AS (
        SELECT doc_id, CAST(i AS INT) AS pos, {s_expr} AS s,
               DENSE_RANK() OVER (ORDER BY {s_expr}) AS r,
               COUNT(*) OVER (PARTITION BY {s_expr}) AS class_n
        FROM pos
    ),
    reps AS (SELECT r, MIN(s ORDER BY s) AS s FROM sfx GROUP BY r),
    adj AS (
        SELECT r, s, LAG(s) OVER (ORDER BY r) AS prev,
               LEAD(s) OVER (ORDER BY r) AS nxt
        FROM reps
    ),
    lcps AS (
        SELECT r, GREATEST(
            COALESCE(len(list_filter(
                range(1, least(len(s), len(prev)) + 1),
                i -> s[1:i] = prev[1:i])), 0),
            COALESCE(len(list_filter(
                range(1, least(len(s), len(nxt)) + 1),
                i -> s[1:i] = nxt[1:i])), 0)) AS adj_lcp
        FROM adj
    ),
    prof AS (
        SELECT doc_id, pos, rep_len FROM (
            SELECT sfx.doc_id, sfx.pos,
                   CAST(GREATEST(l.adj_lcp,
                        CASE WHEN sfx.class_n >= 2 THEN len(sfx.s)
                             ELSE 0 END) AS INT) AS rep_len
            FROM sfx JOIN lcps l ON l.r = sfx.r
        ) WHERE rep_len >= {min_len}
    )"""


_REPEATED_SPANS_ORACLE = f"""
    WITH {_suffix_profile_oracle_ctes()}
    SELECT doc_id, pos, rep_len FROM prof
"""


def _lcp_sql(a: str, b: str) -> str:
    """LCP(a, b) in O(L): position of the FIRST elementwise mismatch
    minus one (prefix equality is monotone, so that equals the count
    of equal prefixes), or min(len) when no mismatch.  The previous
    form counted equal prefix SLICES — building two O(i) arrays per
    probe i, O(L²) work and allocations per neighbor pair (guide
    §1.2 "per-task work"; interleaved same-session A/B of the
    uncapped profile pass at sf0.01: 2.00 → 1.43 s median-of-4,
    identical rows).  NULL neighbor (the LEFT JOIN miss)
    yields NULL, which the callers' COALESCE(.., 0) already absorbs
    — same rows as the old form's empty-filter 0.

    Module-level (ADVICE r12 #1) so tests validate the PRODUCTION
    expression instead of a hardcoded copy."""
    return (
        f"CASE WHEN {a} IS NULL OR {b} IS NULL THEN NULL ELSE "
        f"COALESCE(NULLIF(array_position(transform("
        f"sequence(1, least(size({a}), size({b}))), "
        f"i -> element_at({a}, i) = element_at({b}, i)), false), 0) - 1, "
        f"least(size({a}), size({b}))) END")


# Spark-side twin: the same prof CTE chain, but ranks come from the
# distributed prefix-doubling view ``sr`` (operators/suffix) instead
# of a corpus-wide sort — no single-partition window anywhere.  With
# ``cap`` the materialized suffix slices are cap-truncated (the ``sr``
# view must then be built with the same ``prefix_cap``), turning the
# slice mass from O(Σ per-doc L²/2) into O(Σ L·cap).
def _suffix_profile_spark_ctes(min_len: int = 8,
                               cap: int | None = None,
                               doc_table: str = "documents",
                               sr_table: str = "sr") -> str:
    lcp = _lcp_sql
    # Suffix slices are materialized ONLY for class representatives
    # (one per rank — all members of a rank class are the identical
    # truncated suffix, so any representative yields the same array).
    # The r11/r12a form built a slice per POSITION and pushed them
    # through a MIN(s) SortAggregate: O(N·L) array bytes sorted and
    # shuffled where O(C·L) suffice (guide §2.3 "shuffle keys and
    # metadata instead of payloads"); per-position lengths are
    # arithmetic (ntok − pos), no array needed.  Interleaved
    # same-session A/B of the uncapped profile pass at sf0.01:
    # 1.32 → 0.97 s median-of-5, rows identical.
    n_take_rep = ("size(ta.ta) - c.rep.pos" if cap is None
                  else f"least(size(ta.ta) - c.rep.pos, {cap})")
    len_expr = ("l.ntok - sr.pos" if cap is None
                else f"LEAST(l.ntok - sr.pos, {cap})")
    return f"""
        ta AS (
            SELECT doc_id,
                   filter(split(lower(text), ' +'), t -> t <> '') AS ta
            FROM {doc_table}
        ),
        lens AS (SELECT doc_id, size(ta) AS ntok FROM ta),
        cls AS (
            SELECT suffix_rank AS r, COUNT(*) AS class_n,
                   MIN(named_struct('doc_id', doc_id, 'pos', pos)) AS rep
            FROM {sr_table} GROUP BY suffix_rank
        ),
        reps AS (
            SELECT c.r, slice(ta.ta, c.rep.pos + 1, {n_take_rep}) AS s
            FROM cls c JOIN ta ON ta.doc_id = c.rep.doc_id
        ),
        adj AS (
            SELECT a.r, GREATEST(
                COALESCE({lcp('a.s', 'p.s')}, 0),
                COALESCE({lcp('a.s', 'n.s')}, 0)) AS adj_lcp
            FROM reps a
            LEFT JOIN reps p ON p.r = a.r - 1
            LEFT JOIN reps n ON n.r = a.r + 1
        ),
        prof AS (
            SELECT doc_id, pos, rep_len FROM (
                SELECT sr.doc_id, sr.pos,
                       CAST(GREATEST(adj.adj_lcp,
                            CASE WHEN cls.class_n >= 2 THEN {len_expr}
                                 ELSE 0 END) AS INT) AS rep_len
                FROM {sr_table} sr
                JOIN lens l ON l.doc_id = sr.doc_id
                JOIN cls ON cls.r = sr.suffix_rank
                JOIN adj ON adj.r = sr.suffix_rank
            ) WHERE rep_len >= {min_len}
        )"""


def _repeated_spans_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest-repeated-span profile — the ExactSubstr dedup signal
    (Lee et al. 2022): for every token position, the length of the
    longest span starting there that ALSO occurs elsewhere in the
    corpus, reported where >= 8 tokens.  Suffix-array theory: that
    length is max(LCP with the rank-predecessor suffix, LCP with the
    rank-successor, full length when the whole suffix repeats).

    The Spark side builds ranks by distributed prefix doubling
    (`operators/suffix.suffix_ranks`) and — unlike the oracle's
    LAG/LEAD over a global sort — finds rank-neighbors with an
    EQUI-JOIN on r±1 (dense ranks are contiguous), so no corpus-wide
    single-partition window exists anywhere in the plan.  LCP of two
    materialized neighbor suffixes is a bounded prefix comparison.
    DuckDB derives the same profile from an actual suffix sort."""
    from ..session import configure_for_oracle

    configure_for_oracle(spark)
    register_views(spark, sf_dir)
    ctes = _register_sr_with_profile_ctes(spark, cap=None)
    return spark.sql(f"""
        WITH {ctes}
        SELECT doc_id, CAST(pos AS INT) AS pos, rep_len FROM prof
    """)


def _register_sr_with_profile_ctes(spark: SparkSession,
                                   cap: int | None) -> str:
    """Build the ``sr`` rank view AND the profile CTEs from ONE cap
    value (ADVICE r12 #4): the class-grain reps CTE is only correct
    when the ``sr`` view was built with the same ``prefix_cap`` as the
    CTEs' cap — rank classes must be identical truncated suffixes.
    Funnelling both through this builder makes the pairing structural
    instead of a per-caller convention."""
    from ..operators.suffix import suffix_ranks

    suffix_ranks(spark.table("documents"),
                 prefix_cap=cap).createOrReplaceTempView("sr")
    return _suffix_profile_spark_ctes(cap=cap)


def _exactsubstr_cut_spark(spark: SparkSession, sf_dir: str,
                           cap: int | None = None) -> DataFrame:
    """ExactSubstr span REMOVAL (Lee et al. 2022 §4) — the cut
    operator on top of the repeated-span profile: excise the actual
    variable-length repeated spans the suffix index finds (not fixed
    windows like ``span_dedup``), keeping every span's lowest-doc_id
    owner intact.  The profile comes from distributed prefix doubling
    (operators/suffix.suffix_ranks — no corpus-wide sort); ownership,
    interval union and excision are the shared dual-dialect tail
    (functions/dedup_sql.exactsubstr_cut_tail), so the DuckDB oracle
    cross-derives the whole chain from a direct suffix sort.

    The profile is MATERIALIZED (eager localCheckpoint) before the
    tail: the tail's ``regions`` CTE has three consumers (rstats, the
    token join, the keep anti-join) and Spark's CTE inlining
    re-derives everything upstream per consumer — without the pin the
    optimized plan replays the suffix/LCP chain ~3× (38 parquet scans
    observed; the known multi-consumer CTE trap).  localCheckpoint
    rather than persist(): view expansion re-aliases the plan per CTE
    consumer and the CacheManager's sameResult match fails against
    the re-aliased LogicalRDD copies, so persist() silently caches
    nothing here — the checkpoint replaces the plan wholesale and
    cannot be missed."""
    from ..session import configure_for_oracle

    configure_for_oracle(spark)
    register_views(spark, sf_dir)
    ctes = _register_sr_with_profile_ctes(spark, cap=cap)
    prof = spark.sql(f"""
        WITH {ctes}
        SELECT doc_id, pos, rep_len FROM prof
    """).localCheckpoint(eager=True)
    prof.createOrReplaceTempView("prof_v")
    return spark.sql(f"""
        WITH ta AS (
            SELECT doc_id,
                   filter(split(lower(text), ' +'), t -> t <> '') AS ta
            FROM documents
        ),
        prof AS (SELECT * FROM prof_v),
        {D.exactsubstr_cut_tail(S.SPARK)}
    """)


_EXACTSUBSTR_CUT_ORACLE = f"""
    WITH {_suffix_profile_oracle_ctes()},
    {D.exactsubstr_cut_tail(S.DUCKDB)}
"""

EXACTSUBSTR_PREFIX_CAP = 16  # power of two, >= the 8-token anchor


def _exactsubstr_cut_capped_spark(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """The 100 TB form of the ExactSubstr cut: every suffix is
    truncated to its first ``EXACTSUBSTR_PREFIX_CAP`` tokens before
    ranking and LCP, so (a) prefix doubling stops at ⌈log₂ cap⌉
    rounds regardless of document length and (b) the profile's
    materialized slice mass is O(corpus·cap) instead of O(Σ per-doc
    L²/2) — the uncapped form's hidden quadratic for long documents.

    The CUT OUTPUT IS IDENTICAL to the uncapped operator's
    (test-pinned): inside a long repeated region every interior
    position is itself flagged with rep_len ≥ min(remaining, cap) ≥
    min_len, so consecutive capped intervals [p+j, p+j+cap) union to
    exactly the true region, and anchor ownership keys on the leading
    8 tokens either way.  Only the PROFILE's rep_len values clamp at
    the cap (min(true, cap) pointwise)."""
    return _exactsubstr_cut_spark(spark, sf_dir,
                                  cap=EXACTSUBSTR_PREFIX_CAP)


_EXACTSUBSTR_CUT_CAPPED_ORACLE = f"""
    WITH {_suffix_profile_oracle_ctes(cap=EXACTSUBSTR_PREFIX_CAP)},
    {D.exactsubstr_cut_tail(S.DUCKDB)}
"""


def _repeated_spans_scalable_spark(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Registry wrapper for operators/suffix.repeated_span_profile —
    the exact zero-materialization repeated-span profile (rank-ladder
    binary-decomposition LCPs): hash-matched against the SAME DuckDB
    direct-sort oracle as ``repeated_spans``, so three maximally
    different derivations (materialized-slice LCP over prefix-doubling
    ranks, ladder-decomposition LCP, and the oracle's suffix sort)
    must agree row-for-row."""
    from ..operators.suffix import repeated_span_profile
    from ..session import configure_for_oracle

    configure_for_oracle(spark)
    register_views(spark, sf_dir)
    return repeated_span_profile(spark.table("documents"))


def q_exact_dedup(d: S.Dialect) -> str:
    # exact dedup via content hash: canonical = min doc_id per hash
    return """
        SELECT MD5(text) AS content_hash,
               MIN(doc_id) AS canonical_doc,
               COUNT(*) AS n_copies
        FROM documents
        GROUP BY 1
    """


def q_source_overlap(d: S.Dialect) -> str:
    """Cross-source contamination matrix: for every ordered source
    pair, how many of source_a's distinct normalized fingerprints
    also appear in source_b, with the share of a's fingerprints that
    overlap — the corpus-governance report behind "how much of
    dataset A is already inside dataset B".

    Scale shape: docs collapse to DISTINCT (source, fingerprint)
    first (map + one shuffle on the hash), so the pair join runs on
    fingerprint groups, not documents; the per-source totals are a
    tiny broadcast side.  Pair volume is Σ (sources per
    fingerprint)², bounded by duplicate density across sources.

    The fingerprint is the leading-5-token shingle (a prefix
    fingerprint): full-document normalization finds only exact
    copies, while the prefix catches shared openings — the common
    real-world signal of cross-source ingestion of the same feed."""
    return f"""
        WITH fp AS (
            SELECT DISTINCT source,
                   MD5({d.arr_slice_join(d.token_array('text'), '0', 5)})
                       AS fingerprint
            FROM documents
        ),
        totals AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_fp
            FROM fp GROUP BY source
        ),
        shared AS (
            SELECT a.source AS source_a, b.source AS source_b,
                   CAST(COUNT(*) AS BIGINT) AS n_shared
            FROM fp a
            JOIN fp b ON a.fingerprint = b.fingerprint
                     AND a.source <> b.source
            GROUP BY a.source, b.source
        )
        SELECT s.source_a, s.source_b, s.n_shared, t.n_fp AS n_fp_a,
               ROUND(CAST(s.n_shared AS DOUBLE) / t.n_fp, 4)
                   AS overlap_share
        FROM shared s
        JOIN totals t ON t.source = s.source_a
    """


def q_fingerprint_dedup(d: S.Dialect) -> str:
    # fingerprint on normalized text (lowercase, collapse whitespace,
    # strip non-alphanumerics) — near-dup via normalization
    norm = d.regexp_replace_all(
        d.regexp_replace_all("LOWER(text)", "[^a-z0-9 ]", ""), " +", " ")
    return f"""
        SELECT MD5(TRIM({norm})) AS fingerprint,
               MIN(doc_id) AS canonical_doc,
               COUNT(*) AS n_docs
        FROM documents GROUP BY 1
    """


# ---------------------------------------------------------------------------
# the central UDAF (A3): applyInPandas make_curve vs SQL cumulative oracle
# ---------------------------------------------------------------------------

def _ecdf_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pruned per-row form: a 2-column Project feeds the single
    Exchange into the pandas kernel (plan-pinned).  The counted twin
    ``ecdf_curve_points_counted`` — distinct-values-only shuffle via a
    JVM-side partial aggregate, bit-identical output (equality-tested)
    — is the 100 TB shape, but its two extra aggregate stages cost
    ~2 s of codegen/scheduling at local scale, so the single-shuffle
    form is the bench entry; the GTFS production curves already
    pre-count (plans/analyse_gtfs.py general_delay_counted)."""
    from ..session import configure_for_oracle
    from ..sources.testdata import load_table
    from .analyse import ecdf_curve_points

    configure_for_oracle(spark)
    events = load_table(spark, sf_dir, "events")
    return ecdf_curve_points(events, group_cols=["event_type"],
                             value_col="value")


def _ecdf_jvm_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third derivation of A3: :func:`plans.analyse.ecdf_curve_points_jvm`
    — make_curve expressed entirely as JVM DataFrame ops (counted
    values + window cumsum, zero Python in the plan).  Hash-matched
    against the same DuckDB oracle as the pandas kernel, so kernel,
    counted kernel, and JVM forms are mutually proven equal; this is
    the form a cluster without Python workers (or with Arrow transfer
    as the bottleneck) would run.  Runs the one-call SQL rendering of
    the same plan — building the Column tree costs ~1.4 s of py4j
    round-trips that SQL parsing doesn't (analyse.py docstring)."""
    from ..session import configure_for_oracle
    from .analyse import ecdf_curve_points_jvm_sql

    configure_for_oracle(spark)
    register_views(spark, sf_dir)
    # pre_partition: events.value is a continuous double (~2× distinct
    # ratio), the domain where the single-exchange no-combine form is
    # the right plan at any scale (builder docstring; measured 3×)
    return spark.sql(ecdf_curve_points_jvm_sql(
        "events", group_cols=["event_type"], value_col="value",
        pre_partition=True))


# SQL expression of make_curve's unfocused semantics: y at each distinct
# x is the cumulative count at its FIRST occurrence / total; a leading
# x == 0.0 emits no point (the reference's last_x sentinel); endpoints
# forced to exactly 0 and 1.
_ECDF_ORACLE = """
    WITH vals AS (
        SELECT event_type, value AS x FROM events WHERE value IS NOT NULL
    ),
    pts AS (
        SELECT event_type, x, COUNT(*) AS cnt FROM vals GROUP BY 1, 2
    ),
    cum AS (
        SELECT event_type, x,
               SUM(cnt) OVER (PARTITION BY event_type ORDER BY x) - cnt + 1
                   AS cum_first
        FROM pts
    ),
    filtered AS (SELECT * FROM cum WHERE x <> 0.0),
    stats AS (
        SELECT event_type, MIN(x) AS mn, MAX(x) AS mx, COUNT(*) AS npts
        FROM filtered GROUP BY 1
    ),
    tot AS (SELECT event_type, COUNT(*) AS n FROM vals GROUP BY 1)
    SELECT f.event_type, f.x,
           CASE WHEN f.x = s.mn THEN 0.0
                WHEN f.x = s.mx THEN 1.0
                ELSE f.cum_first / t.n END AS y,
           t.n AS sample_size
    FROM filtered f
    JOIN stats s USING (event_type)
    JOIN tot t USING (event_type)
    WHERE s.npts >= 2
"""


def _ecdf_focused_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..session import configure_for_oracle
    from ..sources.testdata import load_table
    from .analyse import ecdf_curve_points

    configure_for_oracle(spark)
    events = load_table(spark, sf_dir, "events")
    return ecdf_curve_points(events, group_cols=["event_type"],
                             value_col="value", focus=50.0, y_round=6)


def _ecdf_focused_jvm_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Focused (C6 triangular kernel) twin of :func:`_ecdf_jvm_spark`:
    the weighting, cumulative, and endpoint math run entirely JVM-side;
    hash-matched against the same focused oracle as the pandas kernel,
    closing the derivation triangle for the weighted case too."""
    from ..session import configure_for_oracle
    from .analyse import ecdf_curve_points_jvm_sql

    configure_for_oracle(spark)
    register_views(spark, sf_dir)
    return spark.sql(ecdf_curve_points_jvm_sql(
        "events", group_cols=["event_type"], value_col="value",
        focus=50.0, y_round=6))


# Focused make_curve (triangular kernel C6, focus=50): weight 1 at the
# focus falling linearly to 0 at the group min/max; y at each distinct
# x is the cumulative weight at its FIRST occurrence / total weight.
_ECDF_FOCUSED_ORACLE = """
    WITH vals AS (
        SELECT event_type, value AS x FROM events WHERE value IS NOT NULL
    ),
    bounds AS (
        SELECT event_type, MIN(x) AS mn, MAX(x) AS mx, COUNT(*) AS n
        FROM vals GROUP BY 1
    ),
    weighted AS (
        SELECT v.event_type, v.x,
               CASE WHEN v.x = 50.0 THEN 1.0
                    WHEN v.x < 50.0 THEN (v.x - b.mn) / (50.0 - b.mn)
                    ELSE 1.0 - ((v.x - 50.0) / (b.mx - 50.0)) END AS w,
               b.n
        FROM vals v JOIN bounds b USING (event_type)
    ),
    pts AS (
        SELECT event_type, x, w, n, COUNT(*) AS cnt
        FROM weighted GROUP BY 1, 2, 3, 4
    ),
    cum AS (
        SELECT event_type, x, n,
               SUM(w * cnt) OVER (PARTITION BY event_type ORDER BY x
                                  ROWS UNBOUNDED PRECEDING)
                   - w * cnt + w AS cum_first,
               SUM(w * cnt) OVER (PARTITION BY event_type) AS total
        FROM pts
    ),
    filtered AS (SELECT * FROM cum WHERE x <> 0.0),
    stats AS (
        SELECT event_type, MIN(x) AS mn, MAX(x) AS mx, COUNT(*) AS npts
        FROM filtered GROUP BY 1
    )
    SELECT f.event_type, f.x,
           CASE WHEN f.x = s.mn THEN 0.0
                WHEN f.x = s.mx THEN 1.0
                ELSE ROUND(f.cum_first / f.total, 6) END AS y,
           f.n AS sample_size
    FROM filtered f JOIN stats s USING (event_type)
    WHERE s.npts >= 2
"""


def _curve_stack_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The genuinely non-SQL curve stack (simplify → convolution →
    transfer probability) over per-group ECDFs; rows-only driver check
    (deterministic: one row per event_type with rounded stats)."""
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType, IntegerType, StringType, StructField, StructType,
    )

    from .. import curves as cv
    from ..session import configure_for_oracle
    from ..sources.testdata import load_table

    configure_for_oracle(spark)
    events = load_table(spark, sf_dir, "events")
    schema = StructType([
        StructField("event_type", StringType()),
        StructField("n_raw_points", IntegerType()),
        StructField("n_simplified", IntegerType()),
        StructField("median_delay", DoubleType()),
        StructField("median_with_walk", DoubleType()),
        StructField("p_transfer_self_5min", DoubleType()),
    ])

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        made = cv.make_curve(pdf["value"].dropna().to_numpy("float64"))
        if made is None:
            return pd.DataFrame(columns=[f.name for f in schema.fields])
        curve, _ = made
        simp = cv.simplify(curve, 0.01)
        conv = cv.convolve_duration(simp, cv.walk_time_curve(200.0))
        # chance of catching a departure distributed like this arrival
        # but 5 minutes later
        p = cv.transfer_probability(simp, 0, simp, -300)
        return pd.DataFrame([{
            "event_type": pdf["event_type"].iloc[0],
            "n_raw_points": len(curve),
            "n_simplified": len(simp),
            "median_delay": round(float(cv.x_at_y(simp, 0.5)), 4),
            "median_with_walk": round(float(cv.x_at_y(conv, 0.5)), 4),
            "p_transfer_self_5min": round(p, 4),
        }])

    return events.groupBy("event_type").applyInPandas(build, schema)


# The driver's oracle comparison always runs at sf0.01 (brief + driver
# contract); the literal-table oracle below is therefore fixture-bound
# to the same directory the driver registers its DuckDB views from.
_CURVE_STACK_SF_DIR = "/root/testdata/sf0.01"
_curve_stack_oracle_sql: str | None = None


def _curve_stack_oracle() -> str:
    """Literal-table oracle for the non-SQL curve stack (VERDICT r2
    item 2): the expected rows are recomputed OUTSIDE Spark — pandas
    groupby + the NumPy curve library over the sf0.01 events parquet,
    a single-process derivation with none of the distributed
    plumbing — and embedded as a VALUES table, so the driver
    hash-checks the applyInPandas pipeline (grouping, Arrow transfer,
    schema, types) against the local recomputation.  Deterministic
    because every stage (sort-based ECDF, ε-simplify, convolution,
    transfer probability) is order-independent NumPy math; mirrors
    reference semantics at monitor/time_curve.rs:34-77 and
    time_curve.rs:18-32."""
    global _curve_stack_oracle_sql
    if _curve_stack_oracle_sql is not None:
        return _curve_stack_oracle_sql
    import pyarrow.parquet as pq

    from .. import curves as cv

    pdf = pq.read_table(f"{_CURVE_STACK_SF_DIR}/events.parquet",
                        columns=["event_type", "value"]).to_pandas()
    rows = []
    for et, g in pdf.groupby("event_type", sort=True):
        made = cv.make_curve(g["value"].dropna().to_numpy("float64"))
        if made is None:
            continue
        curve, _ = made
        simp = cv.simplify(curve, 0.01)
        conv = cv.convolve_duration(simp, cv.walk_time_curve(200.0))
        p = cv.transfer_probability(simp, 0, simp, -300)
        rows.append((et, len(curve), len(simp),
                     round(float(cv.x_at_y(simp, 0.5)), 4),
                     round(float(cv.x_at_y(conv, 0.5)), 4),
                     round(p, 4)))
    # doubles go through CAST('<repr>' AS DOUBLE): repr is the shortest
    # round-tripping decimal, and strtod parsing is correctly rounded
    # in both engines, so the literal reproduces the exact bits.
    values = ",\n        ".join(
        f"('{et}', {nr}, {ns}, CAST('{md!r}' AS DOUBLE), "
        f"CAST('{mw!r}' AS DOUBLE), CAST('{pt!r}' AS DOUBLE))"
        for et, nr, ns, md, mw, pt in rows)
    _curve_stack_oracle_sql = f"""
        SELECT * FROM (VALUES
        {values}
        ) AS t(event_type, n_raw_points, n_simplified, median_delay,
               median_with_walk, p_transfer_self_5min)
    """
    return _curve_stack_oracle_sql


# ---------------------------------------------------------------------------
# skew mitigation: the salted two-phase aggregate vs the straight
# one-phase GROUP BY oracle — the hash match proves the rewrite is
# semantics-preserving on a key where one group holds ~80% of rows.
# ---------------------------------------------------------------------------

def _salted_agg_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewed-key aggregation routed through the explicit salting
    rewrite (operators/skew.py:33): every event type except
    'purchase' collapses onto one hot key (~80% of rows), the exact
    shape AQE's skew handling can't fix for aggregations; salting
    spreads the hot group over 16 partial groups, then a final
    key-only aggregate merges the partials.  At 100 TB this is the
    difference between one straggler task holding 80% of the table
    and 16 even ones."""
    import pyspark.sql.functions as F

    from ..operators.skew import salted_aggregate
    from ..session import configure_for_oracle
    from ..sources.testdata import load_table

    configure_for_oracle(spark)
    events = load_table(spark, sf_dir, "events")
    keyed = events.withColumn(
        "skew_key",
        F.when(F.col("event_type") == "purchase", F.col("event_type"))
         .otherwise(F.lit("hot")))
    out = salted_aggregate(keyed, ["skew_key"], {
        "n_events": (F.count("*"), F.sum("n_events")),
        "value_sum": (F.sum("value"), F.sum("value_sum")),
        "value_max": (F.max("value"), F.max("value_max")),
    })
    return out.select(
        "skew_key",
        F.col("n_events").cast("long").alias("n_events"),
        F.round("value_sum", 4).alias("value_sum"),
        F.round("value_max", 4).alias("value_max"))


_SALTED_AGG_ORACLE = """
    WITH keyed AS (
        SELECT CASE WHEN event_type = 'purchase' THEN event_type
                    ELSE 'hot' END AS skew_key,
               value
        FROM events
    )
    SELECT skew_key, COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS value_sum,
           ROUND(MAX(value), 4) AS value_max
    FROM keyed GROUP BY skew_key
"""


def _salted_join_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted-join rewrite (operators/skew.py:53) vs a plain JOIN
    oracle: the big side is salted deterministically, the small side
    replicated once per salt value, the join runs on (key, salt) —
    semantics must be EXACTLY the plain equi-join's.  The dim here is
    tiny (broadcastable in practice); the query is the semantics
    proof for the case that matters at scale: a skewed build side too
    large to broadcast."""
    import pyspark.sql.functions as F

    from ..operators.skew import salted_join
    from ..session import configure_for_oracle
    from ..sources.testdata import load_table

    configure_for_oracle(spark)
    events = load_table(spark, sf_dir, "events")
    user_dim = (events.groupBy("user_id")
                .agg(F.min(F.unix_timestamp("ts"))
                     .alias("first_seen_ep")))
    joined = salted_join(events.select("event_id", "user_id"),
                         user_dim, ["user_id"], salt=8)
    return joined.select("event_id", "user_id", "first_seen_ep")


_SALTED_JOIN_ORACLE = """
    WITH dim AS (
        SELECT user_id,
               MIN(epoch_us(ts) // 1000000) AS first_seen_ep
        FROM events GROUP BY user_id
    )
    SELECT e.event_id, e.user_id, d.first_seen_ep
    FROM events e JOIN dim d USING (user_id)
"""


# ---------------------------------------------------------------------------
# near-dup clustering: iterative large-star/small-star CC on the Spark
# side vs a recursive-CTE min-label fixpoint in DuckDB — two entirely
# different derivations of the same partition, hash-matched.
# ---------------------------------------------------------------------------

_CLUSTER_EDGE_THRESHOLD = 0.875  # exact 1/8 multiple: no float drift


def _dedup_clusters_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from ..operators.graph import connected_components
    from ..session import configure_for_oracle

    configure_for_oracle(spark)
    register_views(spark, sf_dir)
    pairs = (spark.sql(D.q_minhash_lsh_pairs(S.SPARK))
             .where(F.col("est_jaccard") >= _CLUSTER_EDGE_THRESHOLD))
    docs = spark.table("documents")
    cc = connected_components(pairs, "doc_a", "doc_b",
                              nodes=docs.select("doc_id"))
    w = Window.partitionBy("cluster_id")
    return (cc.select(F.col("node").alias("doc_id"),
                      F.col("component").alias("cluster_id"))
            .withColumn("cluster_size", F.count("*").over(w)))


def _dedup_clusters_oracle() -> str:
    """Iterative min-label-propagation CC oracle (round 12, VERDICT
    r11 #5): linear working set per round vs the recursive ``reach``
    CTE's quadratic blowup on near-clique graphs — the sf0.1 witness
    now runs cross-engine in seconds instead of the 25-min/20 GB
    recursive wall (SCALING.md)."""
    pairs = D.q_minhash_lsh_pairs(S.DUCKDB)
    return f"""
        WITH
        pairs AS MATERIALIZED (
            SELECT doc_a, doc_b FROM ({pairs}) p
            WHERE est_jaccard >= {_CLUSTER_EDGE_THRESHOLD}
        ),
        edges AS MATERIALIZED (
            SELECT doc_a AS u, doc_b AS v FROM pairs
            UNION ALL
            SELECT doc_b, doc_a FROM pairs
        ),
        nodes AS MATERIALIZED (SELECT doc_id AS node FROM documents),
        {D.cc_iterative_ctes()}
        SELECT node AS doc_id, cluster_id,
               COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
        FROM comp
    """


def _dedup_keep_best_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup keeper: near-dup clusters (LSH candidate
    edges -> connected components) keep their HIGHEST-QUALITY member
    (min doc_id on ties) instead of the min-id convention — what
    production dedup actually ships, since the first-crawled copy is
    often the worst one.  Window is per-cluster (dup-density-sized,
    never corpus-wide)."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from ..operators.graph import connected_components
    from ..session import configure_for_oracle

    configure_for_oracle(spark)
    register_views(spark, sf_dir)
    pairs = (spark.sql(D.q_minhash_lsh_pairs(S.SPARK))
             .where(F.col("est_jaccard") >= _CLUSTER_EDGE_THRESHOLD))
    docs = spark.table("documents")
    cc = connected_components(pairs, "doc_a", "doc_b",
                              nodes=docs.select("doc_id"))
    q = docs.selectExpr(
        "doc_id", f"{S.quality_score('text', S.SPARK)} AS quality")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality").desc(), F.col("doc_id"))
    return (cc.select(F.col("node").alias("doc_id"),
                      F.col("component").alias("cluster_id"))
            .join(q, ["doc_id"])
            .withColumn("is_keeper",
                        F.when(F.row_number().over(w) == 1, 1)
                        .otherwise(0).cast("int")))


def _dedup_keep_best_oracle() -> str:
    """Iterative CC oracle (round 12) — see _dedup_clusters_oracle."""
    pairs = D.q_minhash_lsh_pairs(S.DUCKDB)
    q = S.quality_score("text", S.DUCKDB)
    return f"""
        WITH
        pairs AS MATERIALIZED (
            SELECT doc_a, doc_b FROM ({pairs}) p
            WHERE est_jaccard >= {_CLUSTER_EDGE_THRESHOLD}
        ),
        edges AS MATERIALIZED (
            SELECT doc_a AS u, doc_b AS v FROM pairs
            UNION ALL
            SELECT doc_b, doc_a FROM pairs
        ),
        nodes AS MATERIALIZED (SELECT doc_id AS node FROM documents),
        {D.cc_iterative_ctes()},
        labeled AS (
            SELECT d.doc_id, c.cluster_id, {q} AS quality
            FROM documents d JOIN comp c ON c.node = d.doc_id
        )
        SELECT doc_id, cluster_id, quality,
               CAST(CASE WHEN ROW_NUMBER() OVER (
                        PARTITION BY cluster_id
                        ORDER BY quality DESC, doc_id) = 1
                    THEN 1 ELSE 0 END AS INT) AS is_keeper
        FROM labeled
    """


def q_json_props_stats(d: S.Dialect) -> str:
    """Semi-structured extraction over the events ``props`` JSON
    column — the trip-descriptor-parsing analog (C3) for JSON
    payloads: per event_type, how many rows yield a finite NUMERIC
    ``k`` (n_with_k) and that value's stats.  Extraction is
    null-lenient on both engines (missing key / malformed JSON /
    non-numeric / NaN / ±inf → NULL, never an error), which is the
    property a 100 TB ingest of third-party JSON actually needs; the
    expression is map-only and the aggregate partial-combines below
    the shuffle.

    Cross-engine cast discipline: TRY_CAST AS DOUBLE parses '3.7'
    identically on both engines (TRY_CAST AS INT does NOT — Spark
    nulls it, DuckDB rounds it), and the finite-range guard drops
    NaN/±inf the same way on both (each treats NaN as greater than
    any number, so ``x < 1e308`` is false for it)."""
    k = d.json_get("props", "k")
    num = (f"CASE WHEN TRY_CAST({k} AS DOUBLE) > -1e308 "
           f"AND TRY_CAST({k} AS DOUBLE) < 1e308 "
           f"THEN TRY_CAST({k} AS DOUBLE) END")
    return f"""
        SELECT event_type,
               COUNT(*) AS n,
               COUNT({num}) AS n_with_k,
               ROUND(AVG({num}), 4) AS avg_k,
               ROUND(MIN({num}), 4) AS min_k,
               ROUND(MAX({num}), 4) AS max_k
        FROM events GROUP BY event_type
    """


def q_json_key_histogram(d: S.Dialect) -> str:
    """JSON schema profiling: which top-level keys exist in the
    ``props`` payloads, how often, across how many event types — the
    first question asked of any third-party JSON feed.  Malformed
    and NULL payloads contribute to ``n_bad`` instead of erroring.
    Map-only explode of per-row key lists; one partial-combined
    aggregate."""
    # "bad" must mean the SAME thing on both engines: NULL, invalid
    # JSON, or valid JSON that is not an object (Spark's from_json to
    # a map nulls arrays/scalars; DuckDB needs the json_type guard).
    # Duplicate top-level keys also differ natively (Spark's map
    # dedups, DuckDB's json_keys repeats) — list_distinct aligns them.
    if d.name == "spark":
        # from_json to a map RETAINS duplicate JSON keys (map_keys
        # would count them twice) — array_distinct aligns with the
        # DuckDB side's list_distinct
        keys = ("array_distinct(map_keys("
                "from_json(props, 'map<string,string>')))")
        bad = "from_json(props, 'map<string,string>') IS NULL"
        expl = "explode"
    else:
        # CASE, not AND: DuckDB evaluates AND operands eagerly, so
        # json_type would still throw on invalid input
        is_obj = ("coalesce(CASE WHEN json_valid(props) THEN "
                  "json_type(props) = 'OBJECT' END, FALSE)")
        keys = (f"CASE WHEN {is_obj} "
                f"THEN list_distinct(json_keys(props)) END")
        bad = f"NOT {is_obj}"
        expl = "unnest"
    return f"""
        WITH rows_keyed AS (
            SELECT event_type, {expl}({keys}) AS key
            FROM events WHERE NOT ({bad})
        ),
        per_key AS (
            SELECT key, COUNT(*) AS n_rows,
                   COUNT(DISTINCT event_type) AS n_event_types
            FROM rows_keyed GROUP BY key
        ),
        bad AS (
            SELECT COUNT(*) AS n FROM events WHERE {bad}
        )
        SELECT k.key, k.n_rows, k.n_event_types,
               CAST(b.n AS BIGINT) AS n_bad
        FROM per_key k CROSS JOIN bad b
    """


_INTERVAL_BUCKETED_ORACLE = """
    SELECT p.event_id AS purchase_id, COUNT(*) AS n_follow
    FROM events p
    JOIN events e
      ON e.user_id = p.user_id
     AND e.ts >= p.ts AND e.ts < p.ts + INTERVAL 2 HOUR
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id
"""


def _bpe_histogram_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token histogram under a 10-merge BPE vocabulary learned
    from the same corpus (operators/bpe.py): one corpus pass for word
    counts, the iterative merge loop at vocabulary scale, then the
    histogram re-aggregation.  Deterministic end to end (argmax pair
    tie-break count DESC / pair ASC), so rows are stable across runs;
    merge-sequence parity vs a single-process reference BPE is pinned
    in tests/test_bpe.py."""
    import pyspark.sql.functions as F

    from ..operators.bpe import bpe_token_counts, bpe_train
    from ..session import configure_for_oracle

    configure_for_oracle(spark)
    register_views(spark, sf_dir)
    docs = spark.table("documents")
    merges = bpe_train(docs, n_merges=10)
    return (bpe_token_counts(docs, merges)
            .select("token", F.col("cnt").cast("long").alias("cnt"))
            .orderBy("token"))


def _edit_distance_near_pairs_spark(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """Spark side of ``edit_distance_near_pairs``: materialize the
    capped candidate table once (localCheckpoint), spread it
    round-robin over the cores, then run the Levenshtein verify SQL
    over the view.  The verify rows are tiny in BYTES but huge in
    CPU, so AQE's byte-based coalescing funnels the DP into ONE task
    (guide §2.5 — a skew AQE cannot see; measured sf0.01: 3.4 s
    single-task vs 0.9 s spread).  Same rows — the oracle runs the
    uncapped quadratic reference."""
    from ..session import configure_for_oracle, default_parallelism

    configure_for_oracle(spark)
    register_views(spark, sf_dir)
    cap = spark.sql(D.q_edit_capped_candidates(S.SPARK)) \
        .repartition(default_parallelism()) \
        .localCheckpoint(eager=True)
    cap.createOrReplaceTempView("__edit_capped")
    return spark.sql(D.q_edit_distance_near_pairs_capped(
        S.SPARK, capped_view="__edit_capped"))


def _pca_power_iter_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark side of ``pca_power_iter``: materialize the 4096-row
    scatter matrix ONCE (localCheckpoint) and run the iteration SQL
    over it as a view.  As one SQL string the ``amat`` CTE is inlined
    into every matvec step plus the Rayleigh quotient, re-expanding
    the corpus×DIM² scatter pass iters+1 = 4 times (guide §2.4;
    measured sf0.01: 5.4 s total, 314 Exchange nodes in the single-
    string plan).  Identical math/results — the oracle runs the
    self-contained single string."""
    from ..session import configure_for_oracle

    configure_for_oracle(spark)
    register_views(spark, sf_dir)
    amat = spark.sql(ANN.q_pca_scatter(S.SPARK)).localCheckpoint(eager=True)
    amat.createOrReplaceTempView("__pca_amat")
    return spark.sql(ANN.q_pca_power_iter(S.SPARK, amat_view="__pca_amat"))


def _logreg_quality_iter2_spark(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Spark side of ``logreg_quality_iter2``: materialize the
    (y, f0..f3) feature projection ONCE (localCheckpoint → view) and
    train over the view.  As one SQL string the ``feats`` CTE — two
    regex passes over ``text`` per row — is re-inlined into both
    gradient passes and the accuracy pass, and the UNION ALL output
    form additionally stamps that whole chain once per feature row
    (measured sf0.01: 2.8 s total, 224 Exchange nodes static).  The
    wrapper trains on 40 bytes/doc instead of re-scanning text
    (guide §2.3/§2.4); identical math/rows — the oracle runs the
    self-contained single string with the textbook UNION ALL."""
    from ..session import configure_for_oracle

    configure_for_oracle(spark)
    register_views(spark, sf_dir)
    feats = spark.sql(SAMP.q_logreg_feats(S.SPARK)) \
        .localCheckpoint(eager=True)
    feats.createOrReplaceTempView("__logreg_feats")
    return spark.sql(SAMP.q_logreg_quality_iter2(
        S.SPARK, feats_view="__logreg_feats"))


def _kmeans_clusters_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full k-means operator (operators/clustering.py: k-means||
    seeded-hash init, Lloyd loop to convergence, map-only argmin
    assignment) over the embeddings table — iterative, so rows-only
    at the driver; the 2-round Lloyd kernel is separately
    hash-verified cross-engine as ``kmeans_lloyd2``, and numpy
    parity/convergence are pinned in tests/test_clustering.py.
    Output is integer-only (population, id range, micro-unit centroid
    fingerprint) for cross-run stability."""
    import pyspark.sql.functions as F

    from ..operators.clustering import kmeans
    from ..session import configure_for_oracle

    configure_for_oracle(spark)
    register_views(spark, sf_dir)
    emb = spark.table("embeddings").select(
        "vec_id", F.expr("transform(embedding, v -> CAST(v AS DOUBLE))")
        .alias("embedding"))
    res = kmeans(emb, k=8, max_iter=12, tol=1e-4)
    fp = F.expr("aggregate(cent, 0L, (acc, v) -> "
                "acc + CAST(ROUND(v * 1e6) AS BIGINT))")
    sizes = (res["assignments"].groupBy("cell").agg(
        F.count("*").alias("n_points"),
        F.min("pid").alias("min_id"), F.max("pid").alias("max_id")))
    return (res["centers"].select("cell", fp.alias("cent_fp"))
            .join(sizes, "cell").orderBy("cell")
            .select("cell", "n_points", "min_id", "max_id", "cent_fp"))


# Literal-table oracles for the two iterative registry entries (the
# round-3 curve_stack_stats pattern): both algorithms are seeded and
# deterministic, so their expected output over the driver's sf0.01
# fixture is a stable VALUES table recomputed OUTSIDE Spark
# (plans/ref_single.py — pyarrow + pure Python/NumPy twins, including
# a verified XXH64 twin of the k-means|| sampling hash).  The driver's
# hash gate then checks the distributed pipelines end to end instead
# of recording the weaker rows-only result.
# The literal oracles recompute expected VALUES from the SAME fixture
# dir the checker compares against: honor the checker's
# SPARK_GRAFT_CHECK_DIR override so a non-default scale factor doesn't
# silently compare a Spark run at one SF against sf0.01-derived
# literals (ADVICE r7).
_ITER_ORACLE_SF_DIR = os.environ.get("SPARK_GRAFT_CHECK_DIR",
                                     "/root/testdata/sf0.01")
_bpe_oracle_sql: str | None = None
_kmeans_oracle_sql: str | None = None


def _bpe_histogram_oracle() -> str:
    global _bpe_oracle_sql
    if _bpe_oracle_sql is None:
        from .ref_single import ref_bpe_token_histogram

        rows = ref_bpe_token_histogram(_ITER_ORACLE_SF_DIR)
        values = ",\n        ".join(
            "('{}', {})".format(tok.replace("'", "''"), cnt)
            for tok, cnt in rows)
        _bpe_oracle_sql = f"""
        SELECT token, CAST(cnt AS BIGINT) AS cnt FROM (VALUES
        {values}
        ) AS t(token, cnt)
    """
    return _bpe_oracle_sql


def _kmeans_clusters_oracle() -> str:
    global _kmeans_oracle_sql
    if _kmeans_oracle_sql is None:
        from .ref_single import ref_kmeans_clusters

        rows = ref_kmeans_clusters(_ITER_ORACLE_SF_DIR)
        values = ",\n        ".join(
            f"({c}, {n}, {lo}, {hi}, {fp})"
            for c, n, lo, hi, fp in rows)
        _kmeans_oracle_sql = f"""
        SELECT CAST(cell AS BIGINT) AS cell,
               CAST(n_points AS BIGINT) AS n_points,
               CAST(min_id AS BIGINT) AS min_id,
               CAST(max_id AS BIGINT) AS max_id,
               CAST(cent_fp AS BIGINT) AS cent_fp
        FROM (VALUES
        {values}
        ) AS t(cell, n_points, min_id, max_id, cent_fp)
    """
    return _kmeans_oracle_sql


def q_corpus_report(d: S.Dialect) -> str:
    """The corpus health report a curation run starts from: per
    (source, lang) document and token volumes, summed quality (exact
    integer micro-units — each per-doc score is already ROUND(…,4),
    so ×1e6 is integer-exact and engine sum order cannot drift), and
    how many docs sit in an exact-normalized duplicate family.

    Scale shape: one corpus scan feeds a fingerprint groupBy and a
    fingerprint-keyed equi-join back (the exact-dedup shuffle
    family), then one (source, lang) aggregate — two shuffles total,
    both partial-aggregated."""
    q = S.quality_score("text", d)
    norm = d.regexp_replace_all(
        d.regexp_replace_all("LOWER(text)", "[^a-z0-9 ]", ""), " +", " ")
    return f"""
        WITH base AS (
            SELECT doc_id, source, lang, {q} AS q,
                   CAST({d.arr_len(d.token_array('text'))} AS BIGINT)
                       AS n_tokens,
                   MD5(TRIM({norm})) AS fp
            FROM documents
        ),
        fam AS (SELECT fp, COUNT(*) AS n FROM base GROUP BY fp)
        SELECT b.source, b.lang, COUNT(*) AS n_docs,
               CAST(SUM(b.n_tokens) AS BIGINT) AS total_tokens,
               CAST(SUM(CAST(ROUND(b.q * 1e6) AS BIGINT)) AS BIGINT)
                   AS q_micros_sum,
               CAST(SUM(CASE WHEN f.n > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dup_docs
        FROM base b JOIN fam f ON b.fp = f.fp
        GROUP BY b.source, b.lang
        ORDER BY b.source, b.lang
    """


_JSONL_FIXTURE = str(Path(__file__).resolve().parents[2]
                     / "tests" / "data" / "documents.jsonl")

_JSONL_ORACLE = f"""
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
    FROM read_json('{_JSONL_FIXTURE}',
                   format='newline_delimited',
                   columns={{doc_id:'BIGINT', text:'VARCHAR',
                            lang:'VARCHAR', source:'VARCHAR',
                            n_chars:'BIGINT'}},
                   ignore_errors=true)
    WHERE doc_id IS NOT NULL
    GROUP BY lang ORDER BY lang
"""


def _jsonl_scan_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-family extension: JSONL document ingest (sources/jsonl.py —
    text scan + from_json, PERMISSIVE corrupt-record split) vs
    DuckDB's read_json(ignore_errors).  Malformed lines: Spark routes
    them to the bad side, DuckDB nulls them — both engines' good sets
    align on doc_id IS NOT NULL, and the malformed-line accounting
    itself is pinned in tests/test_jsonl.py."""
    import pyspark.sql.functions as F

    from ..session import configure_for_oracle
    from ..sources.jsonl import read_documents_jsonl

    configure_for_oracle(spark)
    good, _bad = read_documents_jsonl(spark, _JSONL_FIXTURE)
    return (good.where(F.col("doc_id").isNotNull())
            .groupBy("lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").alias("total_chars"),
                 F.min("doc_id").alias("min_id"),
                 F.max("doc_id").alias("max_id"))
            .orderBy("lang"))


def _interval_bucketed_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The generic ``operators.joins.interval_join`` (grid-prefiltered
    range join: candidates from coarse time-bucket equi-keys, exact
    containment as the residual) driver-verified against the textbook
    theta-join oracle — per purchase, the same user's events inside
    the following 2-hour window (the S8 departure-window shape).
    Candidate volume scales with local temporal density, never
    |events|² per user."""
    import pyspark.sql.functions as F

    from ..operators.joins import interval_join
    from ..session import configure_for_oracle

    configure_for_oracle(spark)
    register_views(spark, sf_dir)
    events = spark.table("events").select(
        "event_id", F.col("user_id").alias("cust"), "ts")
    intervals = (spark.table("events")
                 .where(F.col("event_type") == "purchase")
                 .select(F.col("event_id").alias("purchase_id"),
                         F.col("user_id").alias("cust"),
                         F.col("ts").alias("w_start"),
                         (F.col("ts") + F.expr("INTERVAL 2 HOURS"))
                         .alias("w_end")))
    joined = interval_join(events, intervals, "ts", "w_start", "w_end",
                           by=["cust"], bucket_s=3600)
    return joined.groupBy("purchase_id").agg(
        F.count("*").alias("n_follow"))


def q_label_centroid_stats(d: S.Dialect) -> str:
    """Embedding-space quality evaluation per class label: cluster
    size, centroid norm, and inertia (mean squared distance to the
    label centroid) — the structure check run on any labeled
    embedding table before trusting it for retrieval or dedup.

    Scale shape: centroids come from ONE explode-by-dimension
    aggregate — (label, dim) cells, |labels|·dim rows out of the
    shuffle regardless of corpus size — and the inertia pass joins
    the tiny centroid table back (broadcastable) with the squared
    distance folded JVM-side per row.  ROUND everywhere so engine
    summation order cannot reach the driver hash."""
    return f"""
        WITH cv AS (
            SELECT vec_id, label,
                   {d.to_double_array('embedding')} AS emb
            FROM embeddings
        ),
        cells AS (
            SELECT label, i.i AS dim,
                   AVG({d.arr_get('emb', 'i.i')}) AS c
            FROM cv CROSS JOIN {d.series(ANN.DIM)} i
            GROUP BY label, i.i
        ),
        centroids AS (
            SELECT label, {d.ordered_list('c', 'dim')} AS cemb
            FROM cells GROUP BY label
        )
        SELECT v.label, COUNT(*) AS n,
               ROUND(SQRT({d.arr_dot('c.cemb', 'c.cemb')}), 4)
                   AS centroid_norm,
               -- |v - c|^2 via the dot identity: no zip/fold needed
               ROUND(AVG({d.arr_dot('v.emb', 'v.emb')}
                         + {d.arr_dot('c.cemb', 'c.cemb')}
                         - 2 * {d.arr_dot('v.emb', 'c.cemb')}), 4)
                   AS inertia
        FROM cv v JOIN centroids c ON c.label = v.label
        GROUP BY v.label, {d.arr_dot('c.cemb', 'c.cemb')}
    """


def _asof_salted_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 via the generic operator with hot-key salting: the salted
    union+fill (operators/joins.py `_salt_by_time_range`) against the
    same windowed range-join oracle as `asof_join` — a third
    derivation proving the skew path row-identical."""
    from ..operators.joins import asof_join
    from ..session import configure_for_oracle

    configure_for_oracle(spark)
    register_views(spark, sf_dir)
    import pyspark.sql.functions as F

    events = spark.table("events").select(
        "event_id", F.col("user_id").alias("cust"), "ts")
    orders = spark.table("orders").select(
        F.col("o_custkey").alias("cust"),
        F.col("o_orderdate").alias("odate"), "o_orderkey")
    out = asof_join(events, orders, "ts", "odate", by=["cust"],
                    value_cols=["o_orderkey"], strategy="fill",
                    salt_buckets=16)
    return (out.where(F.col("o_orderkey_asof").isNotNull())
            .select("event_id",
                    F.col("o_orderkey_asof").alias("matched_order")))


def _asof_tolerance_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 with the ``merge_asof(tolerance=...)`` staleness cap: the
    operator's fill path computes the plain as-of match, then NULLs
    payloads staler than 8 400 days (events are 2024, orders 1995-2001,
    so the cap lands mid-distribution: ~5.5 k of 10 k matches survive
    at sf0.01).  The oracle applies the cap as a range-predicate lower
    bound before ranking — equivalent because the as-of pick is the
    CLOSEST at-or-before row: if it is out of tolerance every older
    candidate is too."""
    from ..operators.joins import asof_join
    from ..session import configure_for_oracle

    configure_for_oracle(spark)
    register_views(spark, sf_dir)
    import pyspark.sql.functions as F

    events = spark.table("events").select(
        "event_id", F.col("user_id").alias("cust"), "ts")
    orders = spark.table("orders").select(
        F.col("o_custkey").alias("cust"),
        F.col("o_orderdate").alias("odate"), "o_orderkey")
    out = asof_join(events, orders, "ts", "odate", by=["cust"],
                    value_cols=["o_orderkey"], strategy="fill",
                    tolerance=8400 * 86400)
    return (out.where(F.col("o_orderkey_asof").isNotNull())
            .select("event_id",
                    F.col("o_orderkey_asof").alias("matched_order")))


_ASOF_TOLERANCE_ORACLE = """
    WITH m AS (
        SELECT e.event_id, o.o_orderkey,
               ROW_NUMBER() OVER (
                   PARTITION BY e.event_id
                   ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
               ) AS rn
        FROM events e
        JOIN orders o
          ON o.o_custkey = e.user_id
         AND CAST(o.o_orderdate AS TIMESTAMP) <= e.ts
         AND CAST(o.o_orderdate AS TIMESTAMP) >= e.ts - INTERVAL 8400 DAY
    )
    SELECT event_id, o_orderkey AS matched_order FROM m WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# bigram LM score, DataFrame form: Spark inlines SQL CTEs, so the pure-
# SQL rendering of q_bigram_lm_score would tokenize the corpus once per
# consumer (bg_counts, vocab, scored — ~3 fact scans).  The DataFrame
# pipeline persists the tokenized docs and the exploded bigram stream so
# the fact-scale tokenization runs exactly once; at 100 TB the repeated
# tokenize pass would dominate the whole query.  The DuckDB oracle stays
# the shared SQL (DuckDB materializes CTEs referenced more than once).
# ---------------------------------------------------------------------------


def _bigram_lm_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F
    from pyspark.storagelevel import StorageLevel

    from ..session import configure_for_oracle

    configure_for_oracle(spark)
    register_views(spark, sf_dir)
    d = S.SPARK
    raw = spark.table("documents").select("doc_id", "text")
    # the tokenize is the CPU-heavy step: if the scan yields fewer
    # splits than cores (one small parquet file locally), spread it —
    # on a real lake the input already has >= parallelism splits and
    # this branch never fires
    par = spark.sparkContext.defaultParallelism
    if raw.rdd.getNumPartitions() < par:
        raw = raw.repartition(par)
    raw.createOrReplaceTempView("_bigram_raw_docs")
    docs = spark.sql(f"""
        SELECT doc_id, toks, {d.bigram_list('toks')} AS bgs,
               CAST({d.arr_len('toks')} AS BIGINT) AS n_tok
        FROM (SELECT doc_id, {d.token_array('text')} AS toks
              FROM _bigram_raw_docs) t0
    """).persist(StorageLevel.MEMORY_AND_DISK)
    doc_bg = (docs.where(F.size("bgs") >= 1)
              .select("doc_id", F.explode("bgs").alias("bg"))
              .persist(StorageLevel.MEMORY_AND_DISK))
    bg_counts = doc_bg.groupBy("bg").agg(F.count("*").alias("c_bg"))
    # add-one denominator: bigrams starting with w1, re-aggregated from
    # the vocabulary-sized bg_counts — no second pass over the stream
    w1_counts = (bg_counts
                 .groupBy(F.substring_index("bg", " ", 1).alias("tok"))
                 .agg(F.sum("c_bg").alias("c_w1dot")))
    vocab = (docs.select(F.explode("toks").alias("tok"))
             .agg(F.count_distinct("tok").alias("v")))
    # no broadcast hint on bg_counts: distinct-bigram cardinality
    # grows with the corpus (vocab² bound, billions at lake scale) —
    # AQE broadcasts it when it is actually small; w1_counts and
    # vocab are genuinely vocabulary-sized
    scored = (doc_bg
              .withColumn("w1", F.substring_index("bg", " ", 1))
              .join(bg_counts, "bg")
              .join(F.broadcast(w1_counts),
                    F.col("w1") == w1_counts["tok"])
              .crossJoin(F.broadcast(vocab))
              .groupBy("doc_id")
              .agg(F.sum(F.log((F.col("c_bg") + F.lit(1)).cast("double")
                               / (F.col("c_w1dot") + F.col("v"))))
                   .alias("logp"),
                   F.count("*").alias("n_bg")))
    return (docs.join(scored, "doc_id", "left")
            .select("doc_id", "n_tok",
                    F.round(F.col("logp") / F.col("n_bg"), 4)
                    .alias("avg_logp")))


def _dsir_weights_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry Spark side of ``dsir_weights``: the single-tokenize
    DataFrame pipeline (plans/corpus.py::dsir_weight) instead of the
    pure-SQL rendering — Spark inlines CTEs, so the SQL form
    re-tokenizes the corpus for the ratio-table and scoring branches
    (measured 61.7 s vs 26 s at 500 k docs).  Output contract matches
    ``sampling_sql.q_dsir_weights`` exactly; the DuckDB oracle runs
    the textbook raw-token-stream derivation."""
    import pyspark.sql.functions as F

    from ..session import configure_for_oracle
    from .corpus import dsir_weight

    configure_for_oracle(spark)
    register_views(spark, sf_dir)
    raw = spark.table("documents").select("doc_id", "lang", "text")
    par = spark.sparkContext.defaultParallelism
    if raw.rdd.getNumPartitions() < par:
        raw = raw.repartition(par)
    out = dsir_weight(raw, F.col("lang") == SAMP.DSIR_TARGET_LANG,
                      n_tok_col="n_tok")
    return out.select("doc_id", "lang", "n_tok", "dsir_weight_e4")


def _source_kl_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry Spark side of ``source_kl_divergence``: the
    single-tokenize DataFrame pipeline (plans/corpus.py::source_kl) —
    Spark inlines CTEs, so the pure-SQL rendering
    (``sampling_sql.q_source_kl_divergence``, kept as the semantic
    spec and DuckDB twin) would re-tokenize the corpus once per
    totals branch.  The DuckDB oracle runs the per-occurrence
    textbook derivation."""
    from ..session import configure_for_oracle
    from .corpus import source_kl

    configure_for_oracle(spark)
    register_views(spark, sf_dir)
    raw = spark.table("documents").select("doc_id", "source", "text")
    par = spark.sparkContext.defaultParallelism
    if raw.rdd.getNumPartitions() < par:
        raw = raw.repartition(par)
    return source_kl(raw, group_col="source")


def _curriculum_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry Spark side of ``curriculum_schedule``: the persisted
    single-quality-pass form.  The pure-SQL rendering
    (``sampling_sql.q_curriculum_schedule``, kept as the semantic
    spec) references its quality-scored CTE from both numbering
    branches, and Spark's CTE inlining recomputes the regex-heavy
    quality expression once per branch (15.9 s → 4.4 s at sf1,
    50 k docs).  Persisting the narrow (doc_id, band, h, bucket)
    projection — ~40 bytes/doc — makes quality a ONE-pass cost, which
    is the 100 TB shape: the rank and offset branches then read the
    cached columnar batches."""
    from pyspark.sql import Window, functions as F
    from pyspark.storagelevel import StorageLevel

    from ..functions import sampling_sql as SAMP
    from ..session import configure_for_oracle

    configure_for_oracle(spark)
    register_views(spark, sf_dir)
    h = "MD5(CONCAT('curr1#', CAST(doc_id AS STRING)))"
    keyed = (spark.sql(f"""
        WITH {SAMP._quality_sized(S.SPARK)}
        SELECT doc_id, band, {h} AS h,
               CAST({S.SPARK.hex_to_bigint(f"SUBSTRING({h}, 1, 3)")}
                    AS INT) AS bucket
        FROM sized
    """).persist(StorageLevel.MEMORY_AND_DISK))
    ranked = keyed.withColumn(
        "r", F.row_number().over(
            Window.partitionBy("band", "bucket").orderBy("h", "doc_id")))
    counts = keyed.groupBy("band", "bucket").agg(F.count("*").alias("c"))
    w = (Window.orderBy("band", "bucket")
         .rowsBetween(Window.unboundedPreceding, -1))
    offsets = counts.select(
        "band", "bucket", F.coalesce(F.sum("c").over(w), F.lit(0))
        .alias("off"))
    return (ranked.join(F.broadcast(offsets), ["band", "bucket"])
            .select("doc_id", F.col("band").cast("long").alias("band"),
                    (F.col("off") + F.col("r") - 1).cast("long")
                    .alias("position")))


def q_decayed_engagement(d: S.Dialect, half_life_days: int = 7) -> str:
    """Recency-weighted engagement per event type: each event's value
    contributes ``value · 2^-k`` where k = whole half-lives between
    the event and the corpus's newest event — the freshness weighting
    a data pipeline applies when recent behavior should dominate
    (content ranking, source-quality drift, crawl scheduling).

    EXACT integer arithmetic where engines usually drift: the decay
    factor is a RIGHT SHIFT of the 1e-6-quantized value (2^-k is the
    half-life ladder itself, so no EXP/POWER libm call exists in the
    plan), negative values decay through sign decomposition (shift of
    the magnitude — engine-specific arithmetic-shift/flooring rules
    never apply), k is capped at 62 so the shift stays defined, and
    the per-group SUM is a sum of exact integers — associative under
    any partitioning/combine order.

    Scale shape: map-only weighting + one partial-aggregatable
    groupBy; the anchor (global MAX ts) is a one-row broadcast."""
    e = _epoch_s("ts", d)
    # age is non-negative (anchor = MAX), so Spark's truncating DIV and
    # DuckDB's flooring // agree
    k = (f"LEAST(((a.anchor - {e}) DIV 86400) DIV {half_life_days}, 62)"
         if d.name == "spark" else
         f"LEAST(((a.anchor - {e}) // 86400) // {half_life_days}, 62)")
    v6 = "CAST(ROUND(value * 1e6) AS BIGINT)"
    shifted = (f"shiftright(ABS({v6}), CAST({k} AS INT))"
               if d.name == "spark" else f"(ABS({v6}) >> ({k}))")
    contrib = (f"(CASE WHEN {v6} >= 0 THEN {shifted} "
               f"ELSE -{shifted} END)")
    return f"""
        WITH anch AS (
            SELECT MAX({_epoch_s('ts', d)}) AS anchor FROM events
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM({contrib}) AS BIGINT) AS decayed_value_e6,
               CAST(SUM({v6}) AS BIGINT) AS raw_value_e6
        FROM events CROSS JOIN anch a
        WHERE value IS NOT NULL AND ts IS NOT NULL
        GROUP BY event_type
        ORDER BY event_type
    """


def _containment_pairs_spark(spark: SparkSession, sf_dir: str,
                             threshold_e3: int = 600,
                             max_df: int = 64) -> DataFrame:
    """Registry Spark side of ``containment_pairs``: fingerprint the
    corpus ONCE and persist the df-capped (doc_id, fp) index — the
    SQL spec (``dedup_sql.q_containment_pairs``) references its
    ``winnowed`` CTE from multiple consumers, and Spark's CTE
    inlining would run the rolling-hash winnowing once per consumer.
    One fingerprint pass + the MOSS too-common-fingerprint drop
    (df > ``max_df`` excluded everywhere, capping join fan-out at
    df²) IS the 100 TB shape: the capped index is what a production
    near-dup service materializes."""
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    from ..functions import dedup_sql as D2
    from ..session import configure_for_oracle

    configure_for_oracle(spark)
    register_views(spark, sf_dir)
    raw = (spark.sql(
        f"WITH {D2.winnow_cte(S.SPARK)} SELECT doc_id, fp FROM winnowed")
        .persist(StorageLevel.MEMORY_AND_DISK))
    fdf = raw.groupBy("fp").agg(F.count("*").alias("df"))
    winnowed = (raw.join(fdf.where(F.col("df") <= max_df), "fp")
                .select("doc_id", "fp")
                .persist(StorageLevel.MEMORY_AND_DISK))
    sizes = winnowed.groupBy("doc_id").agg(F.count("*").alias("n_fp"))
    a, b = winnowed.alias("a"), winnowed.alias("b")
    shared = (a.join(b, (F.col("a.fp") == F.col("b.fp"))
                     & (F.col("a.doc_id") < F.col("b.doc_id")))
              .groupBy(F.col("a.doc_id").alias("doc_a"),
                       F.col("b.doc_id").alias("doc_b"))
              .agg(F.count("*").alias("n_shared"))
              .where(F.col("n_shared") >= 2))
    # ONE pass over the candidate pairs: join both size tables, then
    # explode the two directions — a UNION ALL of two branches would
    # recompute the fingerprint join per branch under plan sharing
    both = (shared
            .join(sizes.select(F.col("doc_id").alias("doc_a"),
                               F.col("n_fp").alias("n_fp_a")), "doc_a")
            .join(sizes.select(F.col("doc_id").alias("doc_b"),
                               F.col("n_fp").alias("n_fp_b")), "doc_b"))
    directed = (both.select(
        "n_shared",
        F.explode(F.array(
            F.struct(F.col("doc_a").alias("contained"),
                     F.col("doc_b").alias("container"),
                     F.col("n_fp_a").alias("n_contained_fp")),
            F.struct(F.col("doc_b").alias("contained"),
                     F.col("doc_a").alias("container"),
                     F.col("n_fp_b").alias("n_contained_fp"))))
        .alias("dirn"))
        .select("dirn.contained", "dirn.container", "n_shared",
                "dirn.n_contained_fp"))
    ratio = (F.lit(1e3) * F.col("n_shared").cast("double")
             / F.col("n_contained_fp").cast("double"))
    # filter on the SAME rounded expression that is emitted, so the
    # containment_e3 column can never contradict the predicate at the
    # boundary (a 599.6 ratio is reported as 600 and must be kept)
    rounded = F.round(ratio).cast("long")
    return (directed
            .where(rounded >= threshold_e3)
            .select("contained", "container",
                    F.col("n_shared").cast("long").alias("n_shared"),
                    F.col("n_contained_fp").cast("long")
                    .alias("n_contained_fp"),
                    rounded.alias("containment_e3")))


def q_perplexity_tiers(d: S.Dialect) -> str:
    """CCNet-style corpus tiering: per language, rank documents by
    their corpus-self-trained bigram LM score and cut into three
    equal-population tiers (1 = head / most fluent, 3 = tail) — the
    standard head/middle/tail partition a web-corpus pipeline keeps,
    downsamples, and drops respectively (Wenzek et al. 2020's
    perplexity buckets, with the repo's add-one bigram LM standing in
    for KenLM).

    Determinism: the score is the already-hash-stable ROUND(.,4)
    avg_logp; the NTILE order adds doc_id as tiebreak; scoreless
    documents (no bigrams) sort NULLS LAST into the tail.

    Scale shape: scoring is the bigram_lm pipeline (vocabulary-sized
    count tables, one doc-keyed SUM); the tier cut is a per-language
    NTILE — the oracle's windowed form here, with the two-phase
    range-partitioned numbering of ``equidepth_histogram_scale`` as
    the proven scale path for terabyte strata."""
    return f"""
        WITH base AS ({SAMP.q_bigram_lm_score(d)}),
        langd AS (SELECT doc_id, lang FROM documents)
        SELECT b.doc_id, l.lang, b.avg_logp,
               CAST(NTILE(3) OVER (PARTITION BY l.lang
                    ORDER BY b.avg_logp DESC NULLS LAST, b.doc_id)
                    AS INT) AS tier
        FROM base b JOIN langd l ON l.doc_id = b.doc_id
    """


def _perplexity_tiers_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry Spark side of ``perplexity_tiers``: tiers windowed
    over the persisted single-tokenize ``_bigram_lm_spark`` scores
    (the pure-SQL rendering re-tokenizes per CTE consumer under
    Spark's inlining — same reason bigram_lm_score registers the
    DataFrame form)."""
    from pyspark.sql import Window, functions as F

    scores = _bigram_lm_spark(spark, sf_dir)
    lang = spark.table("documents").select("doc_id", "lang")
    w = (Window.partitionBy("lang")
         .orderBy(F.col("avg_logp").desc_nulls_last(), F.col("doc_id")))
    return (scores.join(lang, "doc_id")
            .select("doc_id", "lang", "avg_logp",
                    F.ntile(3).over(w).cast("int").alias("tier")))


def _bm25_topk_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry Spark side of ``bm25_topk``: ONE tokenize pass
    computes (dl, per-query-term tf) as whole-stage-codegen array
    scans — no corpus-wide token explode for a |terms|-sized query,
    and the persisted table is docs × (2 + |terms|) longs (the SQL
    rendering's two ``docs`` consumers each re-tokenize under Spark's
    CTE inlining, and its tf branch explodes every token).  Same
    arithmetic as ``sampling_sql.q_bm25_topk`` — integer 1e-4 idf,
    per-(doc, term) contribution rounded to BIGINT pre-sum,
    TakeOrdered top-k."""
    import pyspark.sql.functions as F
    from pyspark.storagelevel import StorageLevel

    from ..session import configure_for_oracle

    configure_for_oracle(spark)
    register_views(spark, sf_dir)
    d = S.SPARK
    raw = spark.table("documents").select("doc_id", "text")
    par = spark.sparkContext.defaultParallelism
    if raw.rdd.getNumPartitions() < par:
        raw = raw.repartition(par)
    # one map-only pass: document length + per-query-term counts as
    # array scans (no 10^8-row token explode for a 3-term query)
    def _tf_expr(i: int, term: str):
        # single-param lambda: a second param would make PySpark pass
        # the element INDEX as the next argument
        return (F.size(F.filter("toks", lambda t: t == F.lit(term)))
                .cast("long").alias(f"_tf{i}"))

    tf_exprs = [_tf_expr(i, term)
                for i, term in enumerate(SAMP.BM25_TERMS)]
    sized = (raw.select("doc_id",
                        F.expr(d.token_array("text")).alias("toks"))
             .select("doc_id", F.size("toks").cast("long").alias("dl"),
                     *tf_exprs)
             .persist(StorageLevel.MEMORY_AND_DISK))
    stats = sized.agg(F.count("*").alias("n_docs"),
                      F.avg("dl").alias("avgdl"))
    stack_args = ", ".join(
        f"'{term}', _tf{i}" for i, term in enumerate(SAMP.BM25_TERMS))
    tf = (sized.select(
        "doc_id", "dl",
        F.expr(f"stack({len(SAMP.BM25_TERMS)}, {stack_args}) "
               "AS (tok, tf)"))
        .where(F.col("tf") > 0))
    idf = (tf.groupBy("tok").agg(F.count("*").alias("df"))
           .crossJoin(F.broadcast(stats))
           .select("tok", F.expr(
               # CAST AS DOUBLE: bare `df + 0.5` is DECIMAL on Spark
               # and the division decimal(38,6) — 6-decimal
               # quantization before LN that DuckDB (pure double)
               # doesn't apply, flipping idf_e4 near .5 boundaries
               "CAST(ROUND(LN(1 + (CAST(n_docs - df AS DOUBLE) + 0.5) "
               "/ (CAST(df AS DOUBLE) + 0.5)) "
               "* 1e4) AS BIGINT)").alias("idf_e4")))
    contrib = (tf.join(F.broadcast(idf), "tok")
               .crossJoin(F.broadcast(stats))
               .select("doc_id", F.expr(
                   f"CAST(ROUND(idf_e4 * (tf * ({SAMP.BM25_K1} + 1)) "
                   f"/ (tf + {SAMP.BM25_K1} * (1 - {SAMP.BM25_B} "
                   f"+ {SAMP.BM25_B} * dl / avgdl))) AS BIGINT)")
                   .alias("c_e4")))
    return (contrib.groupBy("doc_id")
            .agg(F.sum("c_e4").cast("long").alias("bm25_e4"),
                 F.count("*").cast("long").alias("n_terms_hit"))
            .orderBy(F.col("bm25_e4").desc(), "doc_id")
            .limit(SAMP.BM25_TOPK))


def _shard_manifest_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The prepare_shards manifest table via the DISTRIBUTED
    composition (plans/corpus: banded two-phase position numbering +
    banded two-phase token prefix sum + commutative fingerprints) —
    hash-checked against the sequential global-window oracle."""
    from ..plans.corpus import shard_assignments, shard_stats
    from ..session import configure_for_oracle

    configure_for_oracle(spark)
    register_views(spark, sf_dir)
    return shard_stats(shard_assignments(spark.table("documents")))


def _sequence_fill_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-sequence occupancy of the band-parallel packer: the
    operator's placements expanded over spanned sequences — checked
    against the sequential recursive-CTE reference
    (DC.q_sequence_fill)."""
    from ..operators.packing import pack_sequences, sequence_fill
    from ..session import configure_for_oracle

    configure_for_oracle(spark)
    register_views(spark, sf_dir)
    return sequence_fill(pack_sequences(spark.table("documents")))


def _sequence_emit_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized training sequences from the band-parallel packer
    (operators/packing.emit_sequences) vs the sequential recursive-CTE
    reference (DC.q_sequence_emit)."""
    from ..operators.packing import emit_sequences, pack_sequences
    from ..session import configure_for_oracle

    configure_for_oracle(spark)
    register_views(spark, sf_dir)
    docs = spark.table("documents")
    return emit_sequences(docs, pack_sequences(docs))


def _sequence_pack_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band-parallel NFD packer (operators/packing.pack_sequences):
    tokenize + seeded-position band JVM-side, one band shuffle, one
    bounded Arrow batch per band — hash-checked against the
    sequential recursive-CTE derivation (q_sequence_pack, DuckDB)."""
    from ..operators.packing import pack_sequences
    from ..session import configure_for_oracle

    configure_for_oracle(spark)
    register_views(spark, sf_dir)
    return pack_sequences(spark.table("documents"))


def _sequence_pack_ffd_spark(spark: SparkSession, sf_dir: str
                             ) -> DataFrame:
    """Band-parallel bounded-open-bin FFD packer
    (operators/packing.pack_sequences_ffd) — hash-checked against
    the list-state recursive-CTE reference (q_sequence_pack_ffd,
    DuckDB)."""
    from ..operators.packing import pack_sequences_ffd
    from ..session import configure_for_oracle

    configure_for_oracle(spark)
    register_views(spark, sf_dir)
    return pack_sequences_ffd(spark.table("documents"))


def _batch_schedule_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band-parallel dynamic batcher (operators/packing.
    schedule_batches): tokenize + seeded-position band JVM-side, one
    band shuffle, one bounded Arrow batch per band — hash-checked
    against the sequential recursive-CTE derivation
    (q_batch_schedule, DuckDB)."""
    from ..operators.packing import schedule_batches
    from ..session import configure_for_oracle

    configure_for_oracle(spark)
    register_views(spark, sf_dir)
    return schedule_batches(spark.table("documents"))


def _sequence_loss_mask_spark(spark: SparkSession, sf_dir: str
                              ) -> DataFrame:
    """Band-parallel packer + below-source-median quality flags +
    map-only mask propagation (operators/packing.sequence_loss_mask)
    — hash-checked against the sequential recursive-CTE derivation
    (q_sequence_loss_mask, DuckDB)."""
    from ..operators.packing import pack_sequences, sequence_loss_mask
    from ..session import configure_for_oracle

    configure_for_oracle(spark)
    register_views(spark, sf_dir)
    docs = spark.table("documents")
    flags = spark.sql(SAMP.q_below_median_quality_flags(S.SPARK))
    return sequence_loss_mask(pack_sequences(docs), flags)


def q_source_release_gate(d: S.Dialect) -> str:
    """Per-source RELEASE decision: the capstone of the governance
    family — every source passes or fails on the composed, already-
    verified rollups (PII clean share, eval-set contamination share,
    exact-dedup removal share, non-ASCII share), with a reason
    bitmask (1=pii, 2=contaminated, 4=duplicated, 8=charset) so a
    drop is auditable per cause — the source-grain twin of the
    doc-grain q_quality_gate.

    Thresholds are release-review conventions (≥99 % PII-clean docs,
    ≤5 % contaminated docs, ≤50 % exact-dup removal, ≤30 % non-ASCII
    mass), not fixture-tuned — the driver fixture passes all four
    everywhere; the planted tests exercise every reason bit.

    Scale shape: each component is a one-scan partial-aggregatable
    rollup (their own registry entries document the shapes); the gate
    joins four |sources|-row tables.  At 100 TB a production run
    materializes the component tables once and the gate reads them —
    the inline composition here is the verification form."""
    from ..functions import decontam_sql as _DC
    from ..functions import dedup_sql as _D
    from ..functions import pii_sql as _PII
    from ..functions import sampling_sql as _SAMP

    return f"""
        WITH pii AS ({_PII.q_pii_source_report(d)}),
        contam AS ({_DC.q_decontamination_report(d)}),
        dups AS ({_D.q_dedup_impact(d)}),
        chars AS ({_SAMP.q_charclass_profile(d)}),
        gated AS (
            SELECT COALESCE(p.source, '(null)') AS source,
                   p.n_docs,
                   CASE WHEN p.clean_share < 0.99 THEN 1 ELSE 0 END
                       AS fail_pii,
                   CASE WHEN COALESCE(c.contaminated_share, 0) > 0.05
                        THEN 1 ELSE 0 END AS fail_contam,
                   CASE WHEN dd.doc_removal_share > 0.5
                        THEN 1 ELSE 0 END AS fail_dedup,
                   CASE WHEN ch.non_ascii_share > 0.3
                        THEN 1 ELSE 0 END AS fail_charset
            -- join keys COALESCEd to a sentinel: a NULL-source cohort
            -- must be GATED (and reported under '(null)'), not silently
            -- dropped by NULL-never-equi-joins
            FROM pii p
            LEFT JOIN contam c
              ON COALESCE(c.source, '(null)')
                 = COALESCE(p.source, '(null)')
            JOIN dups dd
              ON COALESCE(dd.source, '(null)')
                 = COALESCE(p.source, '(null)')
            JOIN chars ch
              ON COALESCE(ch.source, '(null)')
                 = COALESCE(p.source, '(null)')
        )
        SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
               CAST(fail_pii AS INT) AS fail_pii,
               CAST(fail_contam AS INT) AS fail_contam,
               CAST(fail_dedup AS INT) AS fail_dedup,
               CAST(fail_charset AS INT) AS fail_charset,
               CAST(fail_pii + 2 * fail_contam + 4 * fail_dedup
                    + 8 * fail_charset AS INT) AS reason_mask,
               CAST(CASE WHEN fail_pii + fail_contam + fail_dedup
                              + fail_charset = 0
                    THEN 1 ELSE 0 END AS INT) AS released
        FROM gated
    """


QUERIES: dict[str, QueryDef] = {
    "ecdf_curve": QueryDef(spark=_ecdf_spark, oracle=_ECDF_ORACLE,
                           survey_ref="A3 C6 O4"),
    "ecdf_curve_jvm": QueryDef(spark=_ecdf_jvm_spark, oracle=_ECDF_ORACLE,
                               survey_ref="A3 scale path (no-Python)"),
    "ecdf_curve_focused_jvm": QueryDef(
        spark=_ecdf_focused_jvm_spark, oracle=_ECDF_FOCUSED_ORACLE,
        survey_ref="A3 C6 scale path (no-Python)"),
    # ANN paths rendered dual-dialect (functions/ann_sql.py): the
    # driver hash-verifies the FULL approximate result cross-engine;
    # recall-vs-exact quality is asserted in tests/test_similarity.py
    "ann_lsh_topk": _sql_pair(ANN.q_ann_lsh_topk, "similarity-ann-lsh"),
    "ann_ivf_topk": _sql_pair(ANN.q_ann_ivf_topk, "similarity-ann-ivf"),
    "cosine_near_dup": _sql_pair(ANN.q_cosine_near_dup_pairs,
                                 "dedup-embedding-cosine"),
    "semdedup_keep": _sql_pair(ANN.q_semdedup_keep,
                               "dedup-semantic embedding keep-list"),
    "ecdf_curve_focused": QueryDef(spark=_ecdf_focused_spark,
                                   oracle=_ECDF_FOCUSED_ORACLE,
                                   survey_ref="A3 C6"),
    "curve_stack_stats": QueryDef(spark=_curve_stack_spark,
                                  oracle=_curve_stack_oracle,
                                  survey_ref="A4 C7 C13 C14 C15"),
    "pricing_summary": _sql_pair(q_pricing_summary, "A1 A9 F1 F13 F16"),
    "hourly_event_stats": _sql_pair(q_hourly_event_stats, "A1 J10"),
    "global_minmax": _sql_pair(q_global_minmax, "A2"),
    "distinct_users": _sql_pair(q_distinct_users, "A8 U3"),
    "rollup_ladder": _sql_pair(q_rollup_ladder, "A6"),
    "stop_pair_counts": _sql_pair(q_stop_pair_counts, "J4 J5"),
    "asof_join": _sql_pair(q_asof_join, "J3 F15"),
    "anti_join": _sql_pair(q_anti_join, "J7 F9"),
    "spatial_neighbors": _sql_pair(q_spatial_neighbors, "J6 C12"),
    "latest_wins": _sql_pair(q_latest_wins, "W2 ST3 S12"),
    "forward_fill": _sql_pair(q_forward_fill, "W1"),
    "median_rank": _sql_pair(q_median_rank, "W3 O1"),
    "sessionization": _sql_pair(q_sessionization, "W-sessionize ST7"),
    "funnel_steps": _sql_pair(q_funnel_steps, "A-funnel J-ordered"),
    "retention_cohorts": _sql_pair(q_retention_cohorts, "A-cohort"),
    "scd2_intervals": _sql_pair(q_scd2_intervals, "W2-history SCD2"),
    "rolling_hour_avg": _sql_pair(q_rolling_hour_avg, "W-range-frame"),
    "non_final_stops": _sql_pair(q_non_final_stops, "W4 F10"),
    "time_slot_histogram": _sql_pair(q_time_slot_histogram, "C4 F7 A11"),
    "route_sections": _sql_pair(q_route_sections, "C5 W5"),
    "delay_rounding": _sql_pair(q_delay_rounding, "F3"),
    "interval_overlap": _sql_pair(q_interval_overlap, "S8 F14"),
    "autocomplete": _sql_pair(q_autocomplete, "O3 F12"),
    "token_stats": _sql_pair(q_token_stats, "text-analysis"),
    "lang_id": _sql_pair(q_lang_id, "text-analysis"),
    "quality_score": _sql_pair(q_quality_score, "text-analysis"),
    "exact_dedup": _sql_pair(q_exact_dedup, "dedup-exact"),
    "fingerprint_dedup": _sql_pair(q_fingerprint_dedup, "dedup-fingerprint"),
    "source_overlap": _sql_pair(q_source_overlap,
                                "corpus-governance overlap"),
    "union_service_days": _sql_pair(q_union_service_days, "U1"),
    "latest_in_past": _sql_pair(q_latest_in_past, "O7 S11"),
    "orders_by_size": _sql_pair(q_orders_by_size, "O6"),
    "trip_resolution": _sql_pair(q_trip_resolution, "J8"),
    "noon_datetime": _sql_pair(q_noon_datetime, "C1 C2"),
    "contiguous_trips": _sql_pair(q_contiguous_trips, "C20"),
    "value_percentiles": _sql_pair(q_value_percentiles, "C11"),
    "minhash_lsh_pairs": _sql_pair(D.q_minhash_lsh_pairs, "dedup-minhash-lsh"),
    "simhash": _sql_pair(D.q_simhash, "dedup-simhash"),
    "simhash_near_pairs": _sql_pair(D.q_simhash_near_pairs, "dedup-simhash"),
    "simhash_near_pairs_banded": _sql_cross_pair(
        D.q_simhash_near_pairs_banded, D.q_simhash_near_pairs,
        "dedup-simhash scale"),
    "simhash64_near_pairs": _sql_cross_pair(
        D.q_simhash64_near_pairs_banded, D.q_simhash64_near_pairs,
        "dedup-simhash 60-bit corpus-scale width"),
    "edit_distance_near_pairs": QueryDef(
        spark=_edit_distance_near_pairs_spark,
        oracle=D.q_edit_distance_near_pairs(S.DUCKDB),
        survey_ref=(
            "dedup-edit-verify (sketch recall stage + capped "
            "Levenshtein verify stage)")),
    "oov_rate": _sql_pair(SAMP.q_oov_rate,
                          "text-analysis vocab coverage"),
    "retrieval_eval": _sql_pair(ANN.q_retrieval_eval,
                                "similarity-eval MRR + nDCG"),
    "hard_negative_topk": _sql_pair(ANN.q_hard_negative_topk,
                                    "similarity-mining contrastive "
                                    "hard negatives"),
    "centroid_similarity_matrix": _sql_pair(
        ANN.q_centroid_similarity_matrix,
        "similarity-eval label confusability"),
    "pii_source_report": _sql_pair(PII.q_pii_source_report,
                                   "text-pii governance rollup"),
    "normalized_dedup": _sql_pair(D.q_normalized_dedup,
                                  "dedup-canonicalized exact"),
    "dedup_impact": _sql_pair(D.q_dedup_impact,
                              "dedup-governance per-source impact"),
    "readability_scores": _sql_pair(SAMP.q_readability_scores,
                                    "text-quality readability gate"),
    "pq_codes": _sql_pair(ANN.q_pq_codes,
                          "similarity-compression product "
                          "quantization"),
    "ann_pq_topk": _sql_pair(ANN.q_ann_pq_topk,
                             "similarity-ann PQ asymmetric distance"),
    "tokenizer_fertility": _sql_pair(SAMP.q_tokenizer_fertility,
                                     "text-analysis tokenizer "
                                     "fertility per lang"),
    "quality_calibration": _sql_pair(SAMP.q_quality_calibration,
                                     "text-quality per-source "
                                     "percentile calibration"),
    "ann_ivfpq_topk": _sql_pair(ANN.q_ann_ivfpq_topk,
                                "similarity-ann IVF-PQ composition"),
    "dedup_threshold_sweep": _sql_pair(D.q_dedup_threshold_sweep,
                                       "dedup-planner Jaccard "
                                       "threshold sweep"),
    "length_calibration": _sql_pair(
        SAMP.q_length_calibration,
        "text-quality per-source length-filter calibration"),
    "nn_similarity_histogram": _sql_pair(
        ANN.q_nn_similarity_histogram,
        "similarity-eval embedding diversity profile (SemDeDup "
        "threshold curve)"),
    "source_release_gate": _sql_pair(
        q_source_release_gate,
        "corpus-governance per-source release decision (capstone "
        "composition of the verified rollups)"),
    "charclass_profile": _sql_pair(
        SAMP.q_charclass_profile,
        "text-quality character-class decomposition (mojibake / "
        "garbage detector)"),
    "link_domain_histogram": _sql_pair(
        PII.q_link_domain_histogram,
        "corpus-governance outlink domain histogram"),
    "html_extract": _sql_pair(
        PII.q_html_extract,
        "text-extraction HTML to text (map-only scan stage)"),
    "lang_id_confusion": _sql_pair(
        SAMP.q_lang_id_confusion,
        "text-analysis lang-ID error profile (confusion matrix)"),
    "embedding_decontamination": _sql_pair(
        ANN.q_embedding_decontamination,
        "SEMANTIC decontamination: corpus vectors embedding-similar "
        "to any eval-set vector (the paraphrase leakage n-gram "
        "decontaminate cannot see); LSH-bucket candidates, decision "
        "hash-verified including the approximation"),
    "bpe_merges_iter2": _sql_pair(
        SAMP.q_bpe_merges_iter2,
        "tokenizer vocab induction: two BPE merge-learning iterations "
        "(corpus-weighted top adjacent pair, merge applied between "
        "rounds via double-space symbol isolation) — fourth member of "
        "the iterative family; vocab-sized after one token aggregate"),
    "quality_weighted_mixture": _sql_pair(
        SAMP.q_quality_weighted_mixture,
        "corpus-prep composition: calibration global-median gate x "
        "capped water-filling — budget allocated over each source's "
        "quality-ELIGIBLE token mass (both pieces individually "
        "verified; this witnesses the composition)"),
    "ann_pq_topk_packed": _sql_cross_pair(
        ANN.q_ann_pq_topk_packed,
        ANN.q_ann_pq_topk,
        "similarity-PQ flat ADC, PRODUCTION array form (codes packed "
        "one row per vector, per-query LUT array, in-expression "
        "integer fold — pinned equal to the EXPLODED DuckDB "
        "derivation, a cross-derivation oracle)"),
    "lang_id_v2": _sql_pair(
        SAMP.q_lang_id_v2,
        "text-analysis lang-ID v2: stopword-table scoring + charclass "
        "fallback ('other'/'und' instead of collapsing to 'en' — the "
        "upgrade the v1 confusion matrix prescribed)"),
    "lang_id_confusion_v2": _sql_pair(
        SAMP.q_lang_id_confusion_v2,
        "text-analysis lang-ID v2 error profile (confusion matrix, "
        "comparable row-for-row with the v1 matrix)"),
    "embedding_exact_dedup": _sql_pair(
        ANN.q_embedding_exact_dedup,
        "dedup-embedding exact (quantized-component hash)"),
    "decontamination_report": _sql_pair(
        DC.q_decontamination_report,
        "decontamination per-source release review"),
    "shuffle_run_audit": _sql_pair(
        SAMP.q_shuffle_run_audit,
        "corpus-shuffle quality audit (source run-lengths vs random "
        "expectation; position equi-join, no corpus window)"),
    "logreg_quality_iter2": QueryDef(
        spark=_logreg_quality_iter2_spark,
        oracle=SAMP.q_logreg_quality_iter2(S.DUCKDB),
        survey_ref="text-quality learned filter (in-SQL batch GD, "
                   "iterative family with pagerank_iter2 / "
                   "kmeans_lloyd2)"),
    "dedup_threshold_sweep_lsh": _sql_pair(
        D.q_dedup_threshold_sweep_lsh,
        "dedup-planner threshold sweep, banded-estimate rung"),
    "batch_schedule": QueryDef(spark=_batch_schedule_spark,
                               oracle=DC.q_batch_schedule(S.DUCKDB),
                               survey_ref="loader dynamic batching "
                                          "(batch-by-size)"),
    "sequence_loss_mask": QueryDef(
        spark=_sequence_loss_mask_spark,
        oracle=DC.q_sequence_loss_mask(S.DUCKDB),
        survey_ref="loader loss-mask propagation through packing"),
    "pq_recall": _sql_pair(ANN.q_pq_recall,
                           "similarity-eval PQ quantization-loss "
                           "audit"),
    "ngram_jaccard_pairs": _sql_cross_pair(
        D.q_ngram_jaccard_prefix, D.q_ngram_jaccard_pairs,
        "dedup-jaccard prefix-filter scale"),
    "winnow_fingerprints": _sql_pair(D.q_winnow_fingerprint_stats,
                                     "fingerprint-winnow"),
    "winnow_near_pairs": _sql_pair(D.q_winnow_near_pairs,
                                   "fingerprint-winnow pairs"),
    "cosine_topk": _sql_pair(D.q_cosine_topk, "similarity-ann"),
    "dedup_clusters": QueryDef(spark=_dedup_clusters_spark,
                               oracle=_dedup_clusters_oracle(),
                               survey_ref="dedup-clustering scale"),
    "vocab_topk": _sql_cross_pair(SAMP.q_vocab_topk_take,
                                  SAMP.q_vocab_topk,
                                  "text-analysis vocab scale"),
    "zorder_keys": _sql_pair(q_zorder_keys, "layout z-order"),
    "salted_aggregate": QueryDef(spark=_salted_agg_spark,
                                 oracle=_SALTED_AGG_ORACLE,
                                 survey_ref="skew-salted A1"),
    "salted_join": QueryDef(spark=_salted_join_spark,
                            oracle=_SALTED_JOIN_ORACLE,
                            survey_ref="skew-salted J-equi"),
    "bigram_lm_score": QueryDef(spark=_bigram_lm_spark,
                                oracle=SAMP.q_bigram_lm_score(S.DUCKDB),
                                survey_ref="text-analysis lm-quality"),
    "temperature_sample": _sql_pair(SAMP.q_temperature_sample,
                                    "sampling temperature-balance"),
    "stratified_sample": _sql_pair(SAMP.q_stratified_sample,
                                   "sampling-stratified"),
    "hash_bernoulli_sample": _sql_pair(SAMP.q_hash_bernoulli_sample,
                                       "sampling-bernoulli map-only"),
    "seeded_shuffle": _sql_cross_pair(SAMP.q_seeded_shuffle,
                                      SAMP.q_seeded_shuffle_oracle,
                                      "corpus-shuffle global-index"),
    "stratified_sample_scale": _sql_cross_pair(
        SAMP.q_stratified_sample_scale, SAMP.q_stratified_sample,
        "sampling-stratified scale path"),
    "countmin_heavy_hitters": _sql_pair(SK.q_countmin_heavy_hitters,
                                        "sketch-countmin"),
    "hll_distinct": _sql_pair(SK.q_hll_distinct, "sketch-hll A8"),
    "histogram_quantiles": _sql_pair(SK.q_histogram_quantiles,
                                     "sketch-histogram C11"),
    "hll_shard_merge": _sql_pair(SK.q_hll_shard_merge,
                                 "sketch-hll mergeable"),
    "bloom_membership": _sql_pair(SK.q_bloom_membership,
                                  "sketch-bloom join-prune"),
    "tfidf_topk": _sql_pair(SAMP.q_tfidf_topk, "text-analysis tfidf"),
    "decontaminate": _sql_pair(DC.q_decontaminate,
                               "decontamination ngram-overlap"),
    "token_shard_packing": _sql_pair(DC.q_token_shard_packing,
                                     "shard-packing prefix-sum"),
    "token_shard_packing_scale": _sql_cross_pair(
        DC.q_token_shard_packing_scale, DC.q_token_shard_packing,
        "shard-packing scale path"),
    "boilerplate_scrub": _sql_pair(DC.q_boilerplate_scrub,
                                   "dedup-span frequent-ngram removal"),
    "pii_scan": _sql_pair(PII.q_pii_scan, "text-pii map-only"),
    "repetition_signals": _sql_pair(PII.q_repetition_signals,
                                    "text-quality gopher-repetition"),
    # round-4 additions: appended AFTER the frozen driver window
    # (REGISTRY_ORDER) — _ordered() places unknown names last
    "asof_join_salted": QueryDef(spark=_asof_salted_spark,
                                 oracle=q_asof_join(S.DUCKDB),
                                 survey_ref="J3 skew-salted fill"),
    "asof_join_tolerance": QueryDef(spark=_asof_tolerance_spark,
                                    oracle=_ASOF_TOLERANCE_ORACLE,
                                    survey_ref="J3 merge_asof tolerance"),
    "doc_chunking": _sql_pair(q_doc_chunking,
                              "text-chunking map-only splitter"),
    "posting_lists": _sql_pair(q_posting_lists,
                               "inverted-index build"),
    "pmi_pairs": _sql_pair(q_pmi_pairs,
                           "co-occurrence PMI collocations"),
    "sparse_cosine_pairs": _sql_pair(
        q_sparse_cosine_pairs,
        "dedup-sparse-vector cosine via inverted index"),
    "equidepth_histogram": _sql_pair(
        q_equidepth_histogram,
        "planner-stats equi-depth quantile binning"),
    "pagerank_iter2": QueryDef(
        spark=_pagerank_iter2_spark,
        oracle=lambda: q_pagerank_iter2(S.DUCKDB),
        survey_ref="graph fixed-point PageRank (operator vs unrolled SQL)"),
    "suffix_ranks": QueryDef(
        spark=_suffix_ranks_spark,
        oracle=_SUFFIX_RANKS_ORACLE,
        survey_ref="exact-substring dedup index (prefix doubling vs "
                   "direct suffix sort)"),
    "equidepth_histogram_scale": QueryDef(
        spark=_equidepth_scale_spark,
        oracle=lambda: q_equidepth_histogram(S.DUCKDB),
        survey_ref="equi-depth scale path (range-partitioned rank vs "
                   "NTILE window)"),
    "repeated_spans": QueryDef(
        spark=_repeated_spans_spark,
        oracle=_REPEATED_SPANS_ORACLE,
        survey_ref="ExactSubstr longest-repeated-span profile"),
    "token_entropy": _sql_pair(q_token_entropy,
                               "text-quality information density"),
    "cosine_near_dup_lsh": _sql_pair(ANN.q_cosine_near_dup_lsh,
                                     "dedup-embedding-cosine scale"),
    "json_props_stats": _sql_pair(q_json_props_stats,
                                  "semi-structured C3-analog"),
    "json_key_histogram": _sql_pair(q_json_key_histogram,
                                    "semi-structured schema profiling"),
    "label_centroid_stats": _sql_pair(q_label_centroid_stats,
                                      "embedding-space label eval"),
    "knn_label_agreement": _sql_pair(ANN.q_knn_label_agreement,
                                     "embedding-space knn purity"),
    "interval_join_bucketed": QueryDef(
        spark=_interval_bucketed_spark,
        oracle=_INTERVAL_BUCKETED_ORACLE,
        survey_ref="S8-generic range-join scale path"),
    # round-5 additions: the embedding-compression tier
    "embedding_quantize_int8": _sql_pair(
        ANN.q_embedding_quantize_int8,
        "embedding-quantize int8 storage tier"),
    "ann_quantized_topk": _sql_pair(
        ANN.q_ann_quantized_topk,
        "similarity-ann quantized first-pass rank"),
    "random_projection": _sql_pair(
        ANN.q_random_projection,
        "embedding-dim-reduction seeded JL map-only"),
    "span_dedup": _sql_pair(
        D.q_span_dedup,
        "dedup-span C4 cross-document exact spans"),
    "quality_gate": _sql_pair(
        q_quality_gate,
        "text-quality composite keep/drop gate"),
    # iterative algorithm — not SQL-expressible, so the oracle is the
    # literal table recomputed single-process outside Spark
    # (_bpe_histogram_oracle; the round-3 curve_stack_stats pattern),
    # turning the former rows-only row into a full hash check; merge
    # sequence parity is additionally pinned in tests/test_bpe.py
    "bpe_token_histogram": QueryDef(
        spark=_bpe_histogram_spark,
        oracle=_bpe_histogram_oracle,
        survey_ref="text-tokenizer BPE induction"),
    # distributed k-means: the 2-round Lloyd kernel hash-verified
    # cross-engine; the full convergent operator against the NumPy
    # k-means||+Lloyd literal recomputation (plans/ref_single.py)
    "kmeans_lloyd2": _sql_pair(
        ANN.q_kmeans_lloyd2,
        "clustering k-means Lloyd kernel"),
    "kmeans_clusters": QueryDef(
        spark=_kmeans_clusters_spark,
        oracle=_kmeans_clusters_oracle,
        survey_ref="clustering k-means full operator (k-means|| init)"),
    # leakage-safe eval split + budgeted quality selection
    "leakage_safe_split": _sql_pair(
        SAMP.q_leakage_safe_split,
        "split-leakage-safe dup-family-atomic train/valid/test"),
    "quality_budget_select": _sql_cross_pair(
        SAMP.q_quality_budget_select_scale,
        SAMP.q_quality_budget_select,
        "selection-budget best-quality-first under token budget "
        "(score-band scale derivation vs textbook window oracle)"),
    "jsonl_scan": QueryDef(
        spark=_jsonl_scan_spark,
        oracle=_JSONL_ORACLE,
        survey_ref="source JSONL document ingest with corrupt-record "
                   "split"),
    "corpus_report": _sql_pair(
        q_corpus_report,
        "corpus health report: volume/quality/dup-rate per "
        "source×lang"),
    # round-5 second batch: data-selection + retrieval scorers
    "dsir_weights": QueryDef(
        spark=_dsir_weights_spark,
        oracle=SAMP.q_dsir_weights_oracle(S.DUCKDB),
        survey_ref="selection-dsir hashed-unigram importance "
                   "log-ratio weights (single-tokenize DataFrame "
                   "pipeline vs raw token-stream oracle)"),
    "bm25_topk": QueryDef(
        spark=_bm25_topk_spark,
        oracle=SAMP.q_bm25_topk(S.DUCKDB),
        survey_ref="retrieval-bm25 fixed-term top-k (single-tokenize "
                   "pipeline; TakeOrdered, terms-sized idf broadcast)"),
    "source_kl_divergence": QueryDef(
        spark=lambda spark, sf_dir: _source_kl_spark(spark, sf_dir),
        oracle=SAMP.q_source_kl_divergence_oracle(S.DUCKDB),
        survey_ref="corpus distribution-shift KL(source‖corpus) — "
                   "single-tokenize DataFrame pipeline (persisted "
                   "(source, tok) counts) vs the per-occurrence "
                   "textbook oracle"),
    "zipf_slope": _sql_pair(
        SAMP.q_zipf_slope,
        "corpus Zipf rank-frequency slope per lang (integer-moment "
        "least squares over the vocab head)"),
    "embedding_norm_outliers": _sql_pair(
        ANN.q_embedding_norm_outliers,
        "embedding health screen: unit-norm check + per-(label, dim) "
        "2-sigma component outlier cells (moment shuffle is "
        "|labels|*dim regardless of corpus size)"),
    # ---- round-6 additions ----
    "weighted_sample_topk": _sql_pair(
        SAMP.q_weighted_sample_topk,
        "Efraimidis-Spirakis A-ES weighted sampling without "
        "replacement: seeded-uniform ln(u)/w key, global top-k via "
        "TakeOrdered (map-only + k-row driver merge, no corpus sort)"),
    "skew_profile": _sql_pair(
        SK.q_skew_profile,
        "key-skew diagnostic per aggregation domain: key/row counts, "
        "top-1 share, Herfindahl index, recommended salt buckets — "
        "one partial-agg pass, skew-immune by construction"),
    "curriculum_schedule": QueryDef(
        spark=_curriculum_spark,
        oracle=SAMP.q_curriculum_schedule_oracle(S.DUCKDB),
        survey_ref="quality-banded curriculum training order: "
                   "persisted single-quality-pass two-phase "
                   "(band, bucket) numbering vs the global-window "
                   "oracle (SQL spec: q_curriculum_schedule)"),
    "pca_power_iter": QueryDef(
        spark=_pca_power_iter_spark,
        oracle=ANN.q_pca_power_iter(S.DUCKDB),
        survey_ref=(
            "leading principal component by power iteration over the "
            "exact integer scatter matrix (one corpus pass; iterations "
            "run on the 4096-cell moment table; deterministic ordered "
            "folds)")),
    "containment_pairs": QueryDef(
        spark=_containment_pairs_spark,
        oracle=D.q_containment_pairs(S.DUCKDB),
        survey_ref="asymmetric near-dup: winnow-fingerprint "
                   "containment |fp(A) n fp(B)| / |fp(A)| — catches "
                   "quote/expansion relations Jaccard misses; "
                   "persisted one-pass fingerprint index (SQL spec "
                   "q_containment_pairs)"),
    "perplexity_tiers": QueryDef(
        spark=_perplexity_tiers_spark,
        oracle=q_perplexity_tiers(S.DUCKDB),
        survey_ref="CCNet-style per-lang head/middle/tail tiers over "
                   "the bigram LM score (single-tokenize pipeline; "
                   "SQL spec q_perplexity_tiers)"),
    "decayed_engagement": _sql_pair(
        q_decayed_engagement,
        "recency-weighted engagement: exact half-life decay via "
        "right-shift of quantized values (no libm), map-only + one "
        "partial agg"),
    "kmv_source_overlap": _sql_pair(
        SK.q_kmv_source_overlap,
        "cross-source Jaccard from K-minimum-values sketches "
        "(|S|*k sketch rows regardless of corpus size; exact truth "
        "rides along so the driver pins the estimation error)"),
    # ---- round-7 additions ----
    "kmv_overlap_estimate": _sql_pair(
        SK.q_kmv_overlap_estimate,
        "KMV overlap production form: sketch estimate only — the "
        "exact-truth pair join stays in the verified combined form; "
        "this is the pipeline entry point (|S|^2*k beyond one "
        "DISTINCT collapse)"),
    "exactsubstr_cut": QueryDef(
        spark=_exactsubstr_cut_spark,
        oracle=_EXACTSUBSTR_CUT_ORACLE,
        survey_ref="dedup ExactSubstr variable-length span removal "
                   "(suffix-index profile -> owner -> interval-union "
                   "excision; prefix-doubling ranks vs direct-sort "
                   "oracle)"),
    "exactsubstr_cut_capped": QueryDef(
        spark=_exactsubstr_cut_capped_spark,
        oracle=_EXACTSUBSTR_CUT_CAPPED_ORACLE,
        survey_ref="dedup ExactSubstr cut, document-length-independent "
                   "form: cap-truncated suffix ranks/LCP (O(L*cap) "
                   "slice mass, log2(cap) doubling rounds); cut "
                   "output identical to the uncapped operator "
                   "(test-pinned)"),
    "repeated_spans_scalable": QueryDef(
        spark=lambda spark, sf_dir: _repeated_spans_scalable_spark(
            spark, sf_dir),
        oracle=_REPEATED_SPANS_ORACLE,
        survey_ref="ExactSubstr profile, EXACT zero-materialization "
                   "form: rank-ladder binary-decomposition LCPs "
                   "(operators/suffix.lcp_from_levels, O(N log L)); "
                   "same oracle as repeated_spans — three independent "
                   "derivations hash-equal"),
    "weighted_stratified_sample_scale": _sql_cross_pair(
        SAMP.q_weighted_stratified_sample_scale,
        SAMP.q_weighted_stratified_sample,
        "per-stratum A-ES at terabyte-stratum scale: banded two-phase "
        "numbering (only rows of bands before the quota cutoff enter "
        "a window) vs the whole-stratum ROW_NUMBER oracle"),
    "ngram_novelty": _sql_pair(
        D.q_ngram_novelty,
        "per-document n-gram novelty: share of 8-token shingles "
        "occurring in no other document (memorization-risk scalar; "
        "two shingle-grain partial-agg shuffles, no pairs)"),
    "packing_efficiency": _sql_pair(
        DC.q_packing_efficiency,
        "training-sequence packing planner: per (context length, "
        "source) sequences/padding/oversize under one-doc-per-seq "
        "with chunked splits — exact integers, map-only + one "
        "partial agg"),
    # ---- round-8 additions ----
    "sequence_pack": QueryDef(
        spark=_sequence_pack_spark,
        oracle=DC.q_sequence_pack(S.DUCKDB),
        survey_ref="training-sequence NFD packer (band-parallel "
                   "applyInPandas walk vs the sequential "
                   "recursive-CTE reference) — recovers the padding "
                   "budget packing_efficiency prices; packed seqs <= "
                   "naive one-doc-per-seq test-pinned"),
    # ---- round-9 additions ----
    "mixture_weights": _sql_pair(
        SAMP.q_mixture_weights,
        "mixture-weights solver: per-source sampling rates + epoch "
        "counts hitting a temperature(0.5) target token mixture "
        "under a budget with an epoch cap - closed-form capped "
        "water-filling (tightness-sorted prefix, exact integer "
        "cross-multiplications, floored proportional split); one "
        "corpus scan, windows only over the |sources|-row aggregate"),
    "corpus_diff": _sql_pair(
        SK.q_corpus_diff,
        "corpus snapshot diff per (source, status): docs/tokens "
        "added / removed / changed / unchanged between two versions "
        "(oracle simulates v2 in-query so all four statuses are "
        "witnessed; DataFrame twin plans/corpus.corpus_diff runs the "
        "same FULL OUTER id join over two real tables)"),
    "hybrid_rrf_topk": _sql_pair(
        ANN.q_hybrid_rrf_topk,
        "hybrid retrieval, reciprocal-rank fusion: embedding-cosine "
        "and token-Jaccard legs fused by 1e6 DIV (60+rank) over the "
        "union of the per-leg top-k lists (rank-only, no score "
        "calibration); lexical leg is a query-tokens inverted-index "
        "join, fusion is (queries x k)-sized"),
    "ann_recall": _sql_pair(
        ANN.q_ann_recall,
        "IVF recall audit: per sampled query, hits of the exact "
        "brute-force cosine top-k inside the registered IVF path's "
        "result (recall_e4 floored integer) - measure-don't-guess "
        "for the approximate index, exact leg sampled by design"),
    "mixture_drift": _sql_pair(
        SAMP.q_mixture_drift,
        "mixture audit: per-source achieved token share vs prescribed "
        "target (e6 integer shares, FULL OUTER so shortfall and "
        "excess sources both surface), drift + out-of-tolerance flag "
        "- the post-resample / live-corpus check; one scan, "
        "|sources|-row windows"),
    "dedup_keep_best": QueryDef(
        spark=_dedup_keep_best_spark,
        oracle=_dedup_keep_best_oracle(),
        survey_ref="quality-aware dedup keeper: LSH near-dup clusters "
                   "keep their highest-quality member (min id ties) "
                   "instead of min-id - iterative CC operator vs the "
                   "recursive-CTE + per-cluster rank oracle"),
    "mixture_weights_target": _sql_pair(
        SAMP.q_mixture_weights_target,
        "explicit-target mixture solver: caller-prescribed per-source "
        "weights through the same closed-form capped water-filling - "
        "what is ACHIEVABLE under the epoch cap and where the "
        "shortfall redistributes; untargeted sources priced out at "
        "weight 0, uneven fixture targets witness both branches"),
    "sequence_pack_ffd": QueryDef(
        spark=_sequence_pack_ffd_spark,
        oracle=DC.q_sequence_pack_ffd(S.DUCKDB),
        survey_ref="training-sequence FFD packer with bounded "
                   "open-bin list (16): lowest-numbered open seq "
                   "that fits, fullest bin closes on overflow - "
                   "recovers strictly more padding than NFD "
                   "(test-pinned); band-parallel Arrow walk vs the "
                   "list-state recursive-CTE reference"),
    "shard_manifest": QueryDef(
        spark=_shard_manifest_spark,
        oracle=DC.q_shard_manifest_oracle(S.DUCKDB),
        survey_ref="shard-manifest writer accounting: seeded shuffle "
                   "-> token-budget shards -> per-shard counts + "
                   "commutative content fingerprints (the table "
                   "prepare_shards publishes on the atomic manifest); "
                   "banded two-phase prefix sums vs the global-window "
                   "oracle"),
    "blocklist_filter": _sql_pair(
        BLK.q_blocklist_filter,
        "multi-pattern blocklist screen: per-length gram join (the "
        "distributed Aho-Corasick-equivalent set-at-once scan), "
        "overlap-safe blocked-token interval union, broadcast "
        "pattern table, doc-keyed aggregate only"),
    "blocklist_scrub": _sql_pair(
        BLK.q_blocklist_scrub,
        "blocklist excision: cut every token covered by a match and "
        "re-join survivors in order (targeted-removal sibling of "
        "boilerplate_scrub over an arbitrary pattern set; coverage "
        "anti-join, doc-co-partitioned)"),
    "sequence_fill": QueryDef(
        spark=_sequence_fill_spark,
        oracle=DC.q_sequence_fill(S.DUCKDB),
        survey_ref="packer occupancy table: per (band, seq) docs / "
                   "fill / padding (the loader-facing number) - "
                   "operator placements expanded vs the sequential "
                   "recursive-CTE reference"),
    "sequence_emit": QueryDef(
        spark=_sequence_emit_spark,
        oracle=DC.q_sequence_emit(S.DUCKDB),
        survey_ref="materialized training sequences: per (band, seq) "
                   "token stream + doc_id:offset:len boundary spans "
                   "(what the loader reads) - JVM slice/sort emission "
                   "over operator placements vs the recursive-CTE "
                   "reference"),
    "table_profile": _sql_pair(
        SK.q_table_profile,
        "column-level table profile: nulls / exact distincts / "
        "quantized min-max per column in ONE scan (single aggregate "
        "+ literal unpivot); approx_count_distinct or the HLL sketch "
        "is the documented lake-scale rung"),
    "table_profile_approx": _sql_pair(
        SK.q_table_profile_approx,
        "the profile's approx rung, driver-witnessed: exact "
        "rows/nulls/min-max per column + a Spark-side flag pinning "
        "approx_count_distinct within 5% of exact (the oracle fixes "
        "the flag at 1 - the hash goes red if the HLL drifts); the "
        "pure-approx face has no Expand and is the CLI default above "
        "its row threshold"),
    "lsh_config_planner": _sql_pair(
        D.q_lsh_config_planner,
        "LSH banding planner: exact per-(rows, bands) candidate probe "
        "volume / bucket occupancy / docs-in-candidates via bucket "
        "counts (sum C(n,2)) - never a pair materialization; the "
        "table read before committing to a banding"),
    "url_canonical_dedup": _sql_pair(
        PII.q_url_canonical_dedup,
        "URL canonicalization + host-key dedup: lowercase "
        "scheme/host, strip default ports and fragments and trailing "
        "slashes, remove a pinned public tracking-param list "
        "(utm_*/fbclid/gclid/...), sort surviving params, then ONE "
        "url_canon-keyed aggregate (n_dups, distinct raw spellings "
        "collapsed, min-doc_id keeper, canonical host for "
        "leakage_safe_split-style host families); map-only string "
        "ops + one shuffle - the cheapest dedup rung, runs before "
        "any content hashing"),
    "embedding_decontam_recall_tables": _sql_pair(
        ANN.q_embedding_decontam_recall_tables,
        "the decontamination recall audit's actionable axis: recall "
        "vs LSH table count at the production threshold (the "
        "ann_recall nprobe-sweep idea applied to the banding) - "
        "measured 33/67/83% at 2/4/8 tables on the fixture, the "
        "curve a pipeline reads to buy its recall target"),
    "url_host_split": _sql_pair(
        PII.q_url_host_split,
        "host-family leakage-safe split: every document of the same "
        "CANONICAL host (tracking-param-stripped, case/port/slash "
        "normalized) gets the same train/valid/test assignment from "
        "ONE seeded MD5 draw of the host - the leakage_safe_split "
        "rule with the URL host as the family key; map-only end to "
        "end, zero shuffles"),
    "embedding_decontam_recall": _sql_pair(
        ANN.q_embedding_decontam_recall,
        "decontamination recall audit: per threshold, the share of "
        "exactly-contaminated corpus vectors (brute-force cosine vs "
        "the stride-sampled eval set) the LSH-bucket-limited "
        "embedding_decontamination decision flags - the ann_recall "
        "doctrine applied to the decontamination decision; "
        "lsh_subset pins flagged-set-is-subset-of-exact, so recall "
        "is the one free number (~29-33% on the near-random fixture, "
        "recorded in SCALING.md)"),
    "image_dhash": QueryDef(
        spark=PERC.image_dhash_query,
        oracle=D.q_image_dhash(S.DUCKDB),
        survey_ref="perceptual image fingerprint (dHash): synthetic "
                   "PNG payloads -> stdlib decode -> integer luminance "
                   "-> 9x8 resample -> 60-bit difference hash, all in "
                   "Arrow-batched map-only kernels; the DuckDB oracle "
                   "derives the same integers from the deterministic "
                   "pixel grid in pure SQL, never touching a PNG byte "
                   "- one hash match proves the whole codec pipeline"),
    "image_near_pairs_banded": QueryDef(
        spark=PERC.image_near_pairs_query,
        oracle=D.q_image_near_pairs(S.DUCKDB),
        survey_ref="perceptual image near-duplicates: Hamming-banded "
                   "pair join (4 x 15-bit bands, pigeonhole-lossless "
                   "for hamming <= 3) over codec-derived dHash "
                   "fingerprints vs the quadratic all-pairs SQL "
                   "oracle - proves banding losslessness AND the "
                   "codec pipeline in one match; planted family "
                   "near-dups land at hamming 0-2, unrelated images "
                   "at ~30"),
    "audio_ehash": QueryDef(
        spark=PERC.audio_ehash_query,
        oracle=D.q_audio_ehash(S.DUCKDB),
        survey_ref="perceptual audio fingerprint (energy-sign hash): "
                   "synthetic 16-bit PCM WAV payloads -> stdlib "
                   "decode -> exact int16 reconstruction -> integer "
                   "L1 energy envelope over 61 segments -> 60-bit "
                   "gradient hash, all map-only Arrow kernels; the "
                   "DuckDB oracle derives the same integers from the "
                   "deterministic amplitude grid without touching a "
                   "WAV byte"),
    "audio_near_pairs_banded": QueryDef(
        spark=PERC.audio_near_pairs_query,
        oracle=D.q_audio_near_pairs(S.DUCKDB),
        survey_ref="perceptual audio near-duplicates: the image "
                   "family's Hamming banding machinery verbatim over "
                   "codec-derived eHash fingerprints vs the quadratic "
                   "all-pairs SQL oracle; planted family perturbations "
                   "land at hamming 0-2"),
    "video_frame_dhash": QueryDef(
        spark=PERC.video_frame_dhash_query,
        oracle=D.q_video_frame_dhash(S.DUCKDB),
        survey_ref="perceptual video fingerprints: array<binary> "
                   "sampled frames -> JVM posexplode -> codec dHash "
                   "per frame (one Arrow map pass; payloads never "
                   "join keys), vs the pure-SQL frame-grid "
                   "derivation - completes the perceptual family "
                   "across all three multimodal column types"),
    "video_near_pairs": QueryDef(
        spark=PERC.video_near_pairs_query,
        oracle=D.q_video_near_pairs(S.DUCKDB),
        survey_ref="video near-duplicates by shared-frame "
                   "containment: DISTINCT frame hashes per video, "
                   "inverted-index equi-join on the 60-bit hash, "
                   "pairs sharing >= 3 of 4 sampled frames (the "
                   "winnowing shape on frames; join volume tracks "
                   "true frame duplication)"),
    "image_dedup_keep": QueryDef(
        spark=PERC.image_dedup_keep_query,
        oracle=D.q_image_dedup_keep_oracle(S.DUCKDB),
        survey_ref="perceptual dedup keeper decision: codec dHash "
                   "fingerprints -> banded near pairs -> iterative "
                   "large-star/small-star connected components -> "
                   "min-id keeper per cluster, cross-derived against "
                   "a DuckDB recursive-CTE label-propagation fixpoint "
                   "over the pure-SQL grid (the dedup_clusters "
                   "pattern on the image modality)"),
    "mad_outliers": _sql_pair(
        q_mad_outliers,
        "robust per-type anomaly screen: exact interpolated "
        "median + MAD, outliers beyond 3*MAD (two aggregate passes, "
        "tiny stats broadcast back; sketch rungs at lake scale)"),
    "weighted_stratified_sample": _sql_pair(
        SAMP.q_weighted_stratified_sample,
        "A-ES weighted sampling per stratum: exact per-lang quotas, "
        "size-proportional draw inside each (mixture-building "
        "primitive)"),
    "image_dedup_recall": QueryDef(
        spark=PERC.image_dedup_recall_query,
        oracle=D.q_image_dedup_recall(S.DUCKDB),
        survey_ref="distortion-robustness recall audit for perceptual "
                   "image dedup (the embedding_decontam_recall "
                   "doctrine on the image modality): REAL brightness-"
                   "clip and nearest-resize distortions through the "
                   "PNG codec, per-class recall at the shipping "
                   "hamming <= 3 threshold; the DuckDB oracle derives "
                   "each distortion's exact grid effect in pure SQL "
                   "(clip arithmetic, composed integer index maps)"),
    "audio_spectral_hash": QueryDef(
        spark=PERC.audio_spectral_hash_query,
        oracle=D.q_audio_spectral_hash(S.DUCKDB),
        survey_ref="spectral audio fingerprint (Haitsma-Kalker shape): "
                   "WAV decode -> per-8-sample-window REAL numpy rFFT "
                   "-> band energies at the integer-exact bins 0/2/4 "
                   "-> sign of time-delta of adjacent band deltas; the "
                   "DuckDB oracle computes the same energies by pure "
                   "integer algebra with ZERO FFT, so the hash match "
                   "proves the float DSP path equals integer algebra "
                   "on every window; fixes eHash's provable pitch "
                   "blindness (equal-envelope different-tone clips)"),
    "audio_spectral_near_pairs": QueryDef(
        spark=PERC.audio_spectral_near_pairs_query,
        oracle=D.q_audio_spectral_near_pairs(S.DUCKDB),
        survey_ref="Hamming-banded near pairs over spectral audio "
                   "fingerprints (image banding machinery verbatim) "
                   "vs the quadratic SQL oracle; planted families "
                   "perturb one segment's DC -> at most 2 bits, "
                   "pitch flips move whole band columns -> ~30 bits"),
    "video_shingle_pairs": QueryDef(
        spark=PERC.video_shingle_pairs_query,
        oracle=D.q_video_shingle_pairs(S.DUCKDB),
        survey_ref="ORDER-AWARE video near-dup: order-2 frame-hash "
                   "shingles (lead over frame order), inverted-index "
                   "join on the shingle value, gaps-and-islands for "
                   "the longest common aligned frame run - a "
                   "reversed/re-cut video with identical stills "
                   "matches video_near_pairs but NOT this operator "
                   "(the r11 order-insensitivity gap); DataFrame "
                   "windows vs DuckDB SQL windows as the independent "
                   "derivations"),
    "image_dedup_recall_jpeg": QueryDef(
        spark=PERC.image_dedup_recall_jpeg_query,
        oracle=None,
        survey_ref="distortion-robustness recall audit, JPEG class: "
                   "true baseline JPEG re-encode at q=85/50 through "
                   "operators/jpeg_codec; float DCT quantization has "
                   "no bit-exact SQL twin so this entry is rows-only "
                   "- its deterministic recall values are pinned by "
                   "tests/test_perceptual.py instead"),
}


# ---------------------------------------------------------------------------
# Driver exposure order — FROZEN round 11.
#
# The driver's CORRECTNESS snapshot records only the FIRST 50 entries
# of queries() dict order.  The freshness policy is a simple ROTATION:
# each round's window = never-witnessed entries first, then the
# oldest-witnessed entries, plus the round's new registrations.
# ---------------------------------------------------------------------------
REGISTRY_ORDER: tuple[str, ...] = (
    # Round-12 rotation (VERDICT r11 #1): after the green round 11,
    # the oldest cohort is the 43 entries whose latest driver row is
    # round 8 (below the r11 boundary).  This round's window = all 43
    # of those + the 7 oldest round-9-witnessed entries as fills.
    # New round-12 registrations may displace the r9 fills (freshest
    # records in the window) at the window TAIL only, before the
    # round-12 freeze.  A green round 12 leaves no registry entry
    # with a driver row older than round 9.
    # Do NOT insert new names anywhere above the "-- window boundary"
    # marker mid-round.
    # tests/test_sql_parity.py::test_registry_window_frozen pins this.
    # -- (a) latest driver row is round 8 (oldest records) --
    "route_sections", "delay_rounding", "interval_overlap", "autocomplete",
    "token_stats", "lang_id", "quality_score", "exact_dedup",
    "fingerprint_dedup", "source_overlap", "union_service_days",
    "latest_in_past", "orders_by_size", "trip_resolution", "noon_datetime",
    "contiguous_trips", "value_percentiles", "minhash_lsh_pairs",
    "simhash", "simhash_near_pairs", "simhash_near_pairs_banded",
    "ngram_jaccard_pairs", "blocklist_filter", "blocklist_scrub",
    "shard_manifest", "lsh_config_planner", "table_profile",
    "pricing_summary", "ecdf_curve", "ecdf_curve_focused",
    "curve_stack_stats", "hourly_event_stats", "ann_ivf_topk",
    "semdedup_keep", "global_minmax", "distinct_users", "rollup_ladder",
    "stop_pair_counts", "asof_join", "anti_join", "spatial_neighbors",
    "latest_wins", "forward_fill",
    # -- (b) round-9-witnessed fills (displaceable by new r12 queries) --
    "sequence_pack", "sequence_fill",
    # -- round-12 registrations (displace the newest r9 fills) --
    # Round-13 adjustment (VERDICT r12 #1): image_dedup_recall_jpeg is
    # registered with oracle=None (float-DCT JPEG re-encode has no
    # bit-exact SQL twin; its recall values are pinned by
    # tests/test_perceptual.py) so it can never turn a driver
    # CORRECTNESS row green.  It moves below the window boundary and
    # the oldest displaced r9 fill, sequence_emit (oracle-paired),
    # returns to the window in its place — 50/50 oracle-paired rows.
    "image_dedup_recall", "sequence_emit",
    "audio_spectral_hash", "audio_spectral_near_pairs",
    "video_shingle_pairs",
    # -- window boundary: entries below are outside the driver snapshot --
    # r9 fills displaced by round-12 registrations, then the remaining
    # round-9-witnessed entries (r9-window order)
    "image_dedup_recall_jpeg", "mixture_weights", "mixture_weights_target",
    "mixture_drift", "dedup_keep_best",
    "ann_recall", "hybrid_rrf_topk", "corpus_diff", "sequence_pack_ffd",
    "table_profile_approx", "edit_distance_near_pairs", "oov_rate",
    "retrieval_eval", "hard_negative_topk", "centroid_similarity_matrix",
    "pii_source_report", "normalized_dedup", "dedup_impact",
    "readability_scores", "median_rank", "sessionization", "funnel_steps",
    "retention_cohorts", "repetition_signals", "ecdf_curve_jvm",
    "ecdf_curve_focused_jvm", "cosine_near_dup", "ann_lsh_topk",
    "winnow_fingerprints", "winnow_near_pairs", "cosine_topk",
    "simhash64_near_pairs", "embedding_quantize_int8",
    "ann_quantized_topk", "random_projection", "span_dedup",
    "quality_gate", "asof_join_tolerance", "doc_chunking", "pmi_pairs",
    "sparse_cosine_pairs", "equidepth_histogram", "pagerank_iter2",
    "dsir_weights", "bm25_topk", "source_kl_divergence", "zipf_slope",
    "embedding_norm_outliers",
    # round-10-witnessed entries (r10-window order)
    "pq_codes", "ann_pq_topk", "ann_ivfpq_topk", "pq_recall",
    "tokenizer_fertility", "quality_calibration", "dedup_threshold_sweep",
    "dedup_threshold_sweep_lsh", "batch_schedule", "sequence_loss_mask",
    "logreg_quality_iter2", "shuffle_run_audit", "decontamination_report",
    "embedding_exact_dedup", "lang_id_confusion", "html_extract",
    "link_domain_histogram", "charclass_profile", "source_release_gate",
    "nn_similarity_histogram", "length_calibration", "temperature_sample",
    "stratified_sample", "hash_bernoulli_sample", "seeded_shuffle",
    "bigram_lm_score", "stratified_sample_scale", "countmin_heavy_hitters",
    "hll_distinct", "weighted_stratified_sample", "bpe_token_histogram",
    "kmeans_clusters", "kmv_overlap_estimate", "exactsubstr_cut",
    "exactsubstr_cut_capped", "repeated_spans_scalable",
    "packing_efficiency", "weighted_stratified_sample_scale",
    "ngram_novelty", "histogram_quantiles", "posting_lists",
    "suffix_ranks", "equidepth_histogram_scale", "repeated_spans",
    "lang_id_v2", "lang_id_confusion_v2", "ann_pq_topk_packed",
    "quality_weighted_mixture", "bpe_merges_iter2",
    "embedding_decontamination",
    # round-11-witnessed entries (the freshest records), r11-window order
    "token_entropy", "kmeans_lloyd2", "leakage_safe_split",
    "quality_budget_select", "jsonl_scan", "corpus_report",
    "asof_join_salted", "cosine_near_dup_lsh", "json_props_stats",
    "json_key_histogram", "label_centroid_stats", "knn_label_agreement",
    "interval_join_bucketed", "dedup_clusters", "vocab_topk",
    "zorder_keys", "salted_aggregate", "salted_join", "hll_shard_merge",
    "bloom_membership", "tfidf_topk", "decontaminate",
    "token_shard_packing", "token_shard_packing_scale",
    "boilerplate_scrub", "pii_scan", "weighted_sample_topk",
    "skew_profile", "curriculum_schedule", "pca_power_iter",
    "containment_pairs", "perplexity_tiers", "decayed_engagement",
    "kmv_source_overlap", "mad_outliers", "scd2_intervals",
    "rolling_hour_avg", "non_final_stops", "time_slot_histogram",
    "image_dhash", "image_near_pairs_banded", "embedding_decontam_recall",
    "url_canonical_dedup", "image_dedup_keep", "audio_ehash",
    "audio_near_pairs_banded", "url_host_split",
    "embedding_decontam_recall_tables", "video_frame_dhash",
    "video_near_pairs",
)

DRIVER_WINDOW = 50


def _ordered() -> list[tuple[str, QueryDef]]:
    ordered = [(n, QUERIES[n]) for n in REGISTRY_ORDER]
    # new registrations not yet added to REGISTRY_ORDER trail the window
    ordered += [(n, qd) for n, qd in QUERIES.items() if n not in REGISTRY_ORDER]
    return ordered


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.spark for name, qd in _ordered()}


def oracle_sql() -> dict[str, str]:
    return {name: (qd.oracle() if callable(qd.oracle) else qd.oracle)
            for name, qd in _ordered() if qd.oracle is not None}
