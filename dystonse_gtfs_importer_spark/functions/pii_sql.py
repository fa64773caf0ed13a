"""PII scrubbing + repetition quality signals, dialect-rendered.

Two more standard LLM-training-data pipeline stages over the
``documents`` table, written once and run on both engines (Spark
executes, DuckDB verifies):

* ``q_pii_scan`` — regex detection + redaction of personally
  identifiable information (URLs, emails, IPv4 addresses,
  international phone numbers).  MAP-ONLY: every column is a scalar
  expression over one row, so at 100 TB this is a pure scan stage —
  no shuffle, stays entirely inside whole-stage codegen (no Python).
  Redaction is SEQUENTIAL (URL → email → IP → phone) and each count
  is taken on the text as already redacted by the previous stages, so
  an email inside a URL is counted once, as the URL that swallowed
  it.  The patterns deliberately use only constructs with identical
  semantics in Java regex and RE2 (character classes, counted
  repetition — no backrefs, no lookaround, no escapes).

* ``q_repetition_signals`` — Gopher-style repetition filters (Rae et
  al. 2021 §A1.1): fraction of tokens claimed by the most frequent
  token, duplicate-token fraction, and the same two signals over
  adjacent-token bigrams.  Scale shape: one partial-aggregatable
  groupBy (doc_id, token) over the exploded stream, then a per-doc
  rollup — the heavy token stream is combined map-side, and nothing
  ever groups by token alone (no hot-vocabulary skew key).
"""

from __future__ import annotations

from . import sql_shared as S

# (name, pattern, replacement) — applied in order; counts are taken on
# the running redacted text so overlapping categories don't double-count
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("url", "https?://[^ ]+", "<URL>"),
    ("email", "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z][a-zA-Z]+",
     "<EMAIL>"),
    ("ip", "([0-9]{1,3}[.]){3}[0-9]{1,3}", "<IP>"),
    ("phone", "[+][0-9][0-9 /()-]{5,}[0-9]", "<PHONE>"),
)


def q_pii_scan(d: S.Dialect) -> str:
    """Per document: per-category redaction counts, total, a clean
    flag, and the MD5 of the fully redacted text (the hash lets the
    driver verify the redacted *content* cross-engine without hauling
    the text through the comparator)."""
    stages = []
    prev = "text"
    for i, (name, pat, repl) in enumerate(PII_PATTERNS):
        cur = f"t{i}"
        stages.append(
            f"{d.regexp_count(prev, pat)} AS n_{name}, "
            f"{d.regexp_replace_all(prev, pat, repl)} AS {cur}")
        prev = cur
    s0, s1, s2, s3 = stages
    total = " + ".join(f"n_{name}" for name, _, _ in PII_PATTERNS)
    return f"""
        WITH u AS (SELECT doc_id, {s0} FROM documents),
        e AS (SELECT doc_id, n_url, {s1} FROM u),
        i AS (SELECT doc_id, n_url, n_email, {s2} FROM e),
        p AS (SELECT doc_id, n_url, n_email, n_ip, {s3} FROM i)
        SELECT doc_id,
               CAST(n_url AS BIGINT) AS n_url,
               CAST(n_email AS BIGINT) AS n_email,
               CAST(n_ip AS BIGINT) AS n_ip,
               CAST(n_phone AS BIGINT) AS n_phone,
               CAST({total} AS BIGINT) AS n_pii,
               CAST(({total}) = 0 AS INT) AS is_clean,
               MD5(t3) AS redacted_hash
        FROM p
    """


def q_repetition_signals(d: S.Dialect) -> str:
    """Per document: token/bigram repetition ratios (the Gopher
    duplicate-fraction gates).  ROUND(…, 4) keeps cross-engine float
    formatting out of the hash; zero-token documents emit zero
    fractions rather than NULL so the gate below composes with a
    plain ``<`` comparison."""
    toks = d.token_array("text")
    bigrams = d.bigram_list("toks")

    def frac(num: str, den: str) -> str:
        return (f"ROUND(CASE WHEN {den} = 0 THEN 0.0 "
                f"ELSE CAST({num} AS DOUBLE) / {den} END, 4)")

    return f"""
        WITH arrs AS (
            SELECT doc_id, {toks} AS toks FROM documents
        ),
        tok_rows AS (
            SELECT doc_id, {d.explode_arr('toks')} AS tok FROM arrs
        ),
        tok_counts AS (
            SELECT doc_id, tok, COUNT(*) AS c
            FROM tok_rows GROUP BY doc_id, tok
        ),
        tok_agg AS (
            SELECT doc_id, SUM(c) AS n_tokens, MAX(c) AS top_tok_c,
                   COUNT(*) AS n_distinct_toks
            FROM tok_counts GROUP BY doc_id
        ),
        bg_rows AS (
            SELECT doc_id, {d.explode_arr(bigrams)} AS bg FROM arrs
        ),
        bg_counts AS (
            SELECT doc_id, bg, COUNT(*) AS c
            FROM bg_rows GROUP BY doc_id, bg
        ),
        bg_agg AS (
            SELECT doc_id, SUM(c) AS n_bigrams, MAX(c) AS top_bg_c,
                   COUNT(*) AS n_distinct_bgs
            FROM bg_counts GROUP BY doc_id
        )
        SELECT a.doc_id,
               CAST(COALESCE(t.n_tokens, 0) AS BIGINT) AS n_tokens,
               {frac('COALESCE(t.top_tok_c, 0)', 'COALESCE(t.n_tokens, 0)')}
                   AS top_token_frac,
               {frac('COALESCE(t.n_tokens - t.n_distinct_toks, 0)',
                     'COALESCE(t.n_tokens, 0)')} AS dup_token_frac,
               CAST(COALESCE(b.n_bigrams, 0) AS BIGINT) AS n_bigrams,
               {frac('COALESCE(b.top_bg_c, 0)', 'COALESCE(b.n_bigrams, 0)')}
                   AS top_bigram_frac,
               {frac('COALESCE(b.n_bigrams - b.n_distinct_bgs, 0)',
                     'COALESCE(b.n_bigrams, 0)')} AS dup_bigram_frac
        FROM arrs a
        LEFT JOIN tok_agg t ON a.doc_id = t.doc_id
        LEFT JOIN bg_agg b ON a.doc_id = b.doc_id
    """


def q_pii_source_report(d: S.Dialect,
                        doc_table: str = "documents") -> str:
    """Per-source PII governance report: document counts, clean-doc
    share, per-category match totals, and PII density per 10k chars —
    the numbers a data-governance review reads before a source is
    admitted to a training mix (the per-doc q_pii_scan rows are the
    evidence; this is the decision surface).

    Counts reuse the exact q_pii_scan sequential-redaction semantics
    (URL swallows its embedded email, etc.), so the report totals are
    consistent with the per-doc scan by construction.

    Determinism: every aggregate is an integer SUM/COUNT; the two
    ratios are a SINGLE division of exact integers each, ROUNDed to 4
    — no float summation order anywhere.  Scale shape: map-only scan
    (the same one q_pii_scan runs) plus ONE partial-aggregatable
    groupBy(source) — |sources| rows out of the shuffle."""
    stages = []
    prev = "text"
    for i, (name, pat, repl) in enumerate(PII_PATTERNS):
        cur = f"t{i}"
        stages.append(
            f"{d.regexp_count(prev, pat)} AS n_{name}, "
            f"{d.regexp_replace_all(prev, pat, repl)} AS {cur}")
        prev = cur
    s0, s1, s2, s3 = stages
    total = " + ".join(f"n_{name}" for name, _, _ in PII_PATTERNS)
    return f"""
        WITH u AS (SELECT doc_id, source, n_chars, {s0} FROM {doc_table}),
        e AS (SELECT doc_id, source, n_chars, n_url, {s1} FROM u),
        i AS (SELECT doc_id, source, n_chars, n_url, n_email, {s2} FROM e),
        p AS (SELECT doc_id, source, n_chars, n_url, n_email, n_ip, {s3}
              FROM i),
        q AS (SELECT doc_id, source, n_chars, n_url, n_email, n_ip,
                     n_phone, ({total}) AS n_pii
              FROM p)
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN n_pii = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_clean_docs,
               ROUND(CAST(SUM(CASE WHEN n_pii = 0 THEN 1 ELSE 0 END)
                          AS DOUBLE) / COUNT(*), 4) AS clean_share,
               CAST(SUM(n_url) AS BIGINT) AS n_url,
               CAST(SUM(n_email) AS BIGINT) AS n_email,
               CAST(SUM(n_ip) AS BIGINT) AS n_ip,
               CAST(SUM(n_phone) AS BIGINT) AS n_phone,
               CAST(SUM(n_pii) AS BIGINT) AS n_pii,
               ROUND(CAST(SUM(n_pii) * 10000 AS DOUBLE)
                     / SUM(n_chars), 4) AS pii_per_10k_chars
        FROM q
        GROUP BY source
    """


def q_html_extract(d: S.Dialect,
                   doc_table: str = "documents") -> str:
    """HTML → text extraction, the stage every web corpus passes
    before any text analysis (the trafilatura/jusText step, scaled
    down to deterministic SQL): drop script/style blocks wholesale,
    strip remaining tags to spaces, decode the six common entities,
    collapse whitespace.  Per document: an is-htmlish flag, link
    count, raw/extracted lengths with the text-to-markup ratio (the
    classic boilerplate signal), and the MD5 of the extracted text so
    the driver verifies extracted CONTENT cross-engine without
    hauling it through the comparator (the pii_scan pattern).

    Regex portability: inline (?i)/(?is) flags, non-greedy
    repetition, and character classes only — identical semantics
    under Java regex (Spark) and RE2 (DuckDB); no backrefs, no
    lookaround, no escape sequences.  Entity decode order is fixed
    (&amp; LAST, so double-encoded text decodes one level per pass —
    the documented convention).  Plain text passes through unchanged
    (tagless input has nothing to strip).  Scale shape: MAP-ONLY —
    every column is a scalar over one row, a pure scan stage."""
    no_blocks = d.regexp_replace_all(
        "text", "(?is)<(script|style)[^>]*>.*?</(script|style)>", " ")
    no_tags = d.regexp_replace_all("t0", "<[^>]*>", " ")
    ent = "t1"
    for src, dst in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                     ("&#39;", "''"), ("&nbsp;", " "), ("&amp;", "&")):
        ent = f"REPLACE({ent}, '{src}', '{dst}')"
    # [ \t\r\n]+ (not just spaces): tabs/newlines in the source must
    # collapse too, or newline-heavy HTML inflates text_len/text_ratio
    collapsed = d.regexp_replace_all(ent, "[ \\t\\r\\n][ \\t\\r\\n]*", " ")
    return f"""
        WITH s0 AS (
            SELECT doc_id, text, {no_blocks} AS t0 FROM {doc_table}
        ),
        s1 AS (SELECT doc_id, text, {no_tags} AS t1 FROM s0),
        s2 AS (SELECT doc_id, text, TRIM({collapsed}) AS extracted
               FROM s1)
        SELECT doc_id,
               CAST({d.regexp_count('text',
                                    '<[a-zA-Z][^>]*>')} > 0 AS INT)
                   AS is_htmlish,
               CAST({d.regexp_count('text', '(?i)<a[^>]*href')}
                    AS BIGINT) AS n_links,
               CAST(LENGTH(text) AS BIGINT) AS raw_len,
               CAST(LENGTH(extracted) AS BIGINT) AS text_len,
               ROUND(CAST(LENGTH(extracted) AS DOUBLE)
                     / GREATEST(LENGTH(text), 1), 4) AS text_ratio,
               MD5(extracted) AS extracted_hash
        FROM s2
    """


def q_link_domain_histogram(d: S.Dialect,
                            doc_table: str = "documents") -> str:
    """Outlink-domain histogram: every href URL in the corpus rolled
    up by domain — total links, documents linking, and the corpus
    link share per domain.  This is the table domain blocklists and
    per-domain caps (the RefinedWeb practice) are decided from, and
    the graph-adjacent counterpart of q_html_extract's per-doc link
    count.

    ``regexp_extract_all(s, p, group)`` has identical name/signature
    semantics in Spark and DuckDB, so the extraction renders as ONE
    shared expression; the domain is the authority between '//' and
    the next '/', ports kept, lowercased.  Scale shape: map-only
    extraction + explode, then ONE partial-aggregatable
    groupBy(domain); per-domain doc counts partial-aggregate as
    (domain, doc) DISTINCT first — no corpus-wide window."""
    href_pat = d.str_lit('(?i)href="(http[^"]*)"')
    dom_pat = d.str_lit("//([^/]*)")
    urls = f"regexp_extract_all(text, {href_pat}, 1)"
    dom = f"LOWER(regexp_extract(url, {dom_pat}, 1))"
    return f"""
        WITH links AS (
            SELECT doc_id, {d.explode_arr(urls)} AS url
            FROM {doc_table}
        ),
        dl AS (
            SELECT doc_id, {dom} AS domain FROM links
        ),
        per_domain AS (
            SELECT domain, COUNT(*) AS n_links
            FROM dl GROUP BY domain
        ),
        per_doc AS (
            SELECT domain, COUNT(*) AS n_docs FROM (
                SELECT DISTINCT domain, doc_id FROM dl
            ) x GROUP BY domain
        ),
        total AS (SELECT COUNT(*) AS n FROM dl)
        SELECT p.domain,
               CAST(p.n_links AS BIGINT) AS n_links,
               CAST(pd.n_docs AS BIGINT) AS n_docs,
               ROUND(CAST(p.n_links AS DOUBLE) / t.n, 4)
                   AS link_share
        FROM per_domain p
        JOIN per_doc pd ON pd.domain = p.domain
        CROSS JOIN total t
    """


# ---------------------------------------------------------------------------
# URL canonicalization + host-key dedup (round 11, VERDICT r10 #6)
# ---------------------------------------------------------------------------

# Pinned PUBLIC tracking-parameter list (the strip set every web-corpus
# canonicalizer ships: Google Analytics utm_*, Facebook fbclid, Google
# Ads gclid/dclid, Microsoft msclkid, Mailchimp mc_eid, Instagram
# igshid, Twitter ref_src).  Keys only — values never matter.
TRACKING_PREFIX = "utm_"
TRACKING_PARAMS = ("fbclid", "gclid", "dclid", "msclkid", "mc_eid",
                   "igshid", "ref_src")


def url_canon_ctes(d: S.Dialect, src_cte: str = "urls") -> str:
    """CTE chain deriving ``canon(doc_id, url, url_canon)`` from any
    ``{src_cte}(doc_id, url)`` — pure string ops, identical in both
    dialects: lowercase scheme and host, strip the scheme's default
    port (:443 https / :80 http), drop the fragment, strip trailing
    path slashes (root '/' collapses with ''), remove pinned tracking
    parameters, and SORT the surviving query parameters so parameter
    order can't split a duplicate group.

    Staged CTEs (the q_html_extract layout) instead of one nested
    expression: Spark doesn't evaluate correlated scalar subqueries
    as plain column expressions.  SUBSTR-based key matching (not
    LIKE) because '_' is a LIKE wildcard and escape syntax differs
    across engines."""
    scheme = "LOWER(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    hostport = ("LOWER(regexp_extract(url, "
                "'^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1))")
    rest = ("regexp_extract(url, "
            "'^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1)")
    path = "regexp_extract(rest, '^([^?]*)', 1)"
    query = "regexp_extract(rest, '[?](.*)$', 1)"
    host = ("CASE WHEN scheme = 'https' THEN "
            f"{d.regexp_replace_all('hostport', ':443$', '')} "
            "WHEN scheme = 'http' THEN "
            f"{d.regexp_replace_all('hostport', ':80$', '')} "
            "ELSE hostport END")
    # regexp strip, NOT two-arg RTRIM: Spark's legacy two-parameter
    # signature is rtrim(trimStr, str) — arguments SWAPPED vs DuckDB
    canon_path = ("CASE WHEN path IN ('', '/') THEN '' ELSE "
                  + d.regexp_replace_all("path", "/+$", "") + " END")
    keep = " AND ".join(
        ["t <> ''",
         f"SUBSTR(t, 1, {len(TRACKING_PREFIX)}) <> '{TRACKING_PREFIX}'"]
        + [f"SUBSTR(t, 1, {len(p) + 1}) <> '{p}='"
           for p in TRACKING_PARAMS])
    if d.name == "spark":
        params = (f"array_join(array_sort(filter(split(query, '&'), "
                  f"t -> {keep})), '&')")
    else:
        params = (f"COALESCE(array_to_string(list_sort(list_filter("
                  f"string_split(query, '&'), t -> {keep})), '&'), '')")
    return f"""
        u0 AS (
            SELECT doc_id, url, {scheme} AS scheme,
                   {hostport} AS hostport, {rest} AS rest
            FROM {src_cte}
        ),
        u1 AS (
            SELECT doc_id, url, scheme, hostport,
                   {path} AS path, {query} AS query
            FROM u0
        ),
        u2 AS (
            SELECT doc_id, url, scheme, {host} AS host,
                   {canon_path} AS canon_path, {params} AS params
            FROM u1
        ),
        canon AS (
            SELECT doc_id, url,
                   scheme || '://' || host || canon_path ||
                   CASE WHEN params <> '' THEN '?' || params
                        ELSE '' END AS url_canon
            FROM u2
        )"""


def synth_url_expr(d: S.Dialect) -> str:
    """Deterministic messy URL per document row (the driver schema has
    no URL column): scheme/host case noise, a default :443 port, a
    trailing slash, a fragment, and tracking parameters planted in
    BOTH query positions — every variant of the same
    (source, doc_id % 40) family must collapse to one canonical URL
    (every 11th doc gets a unique path and stays a singleton)."""
    ds = "CAST(doc_id AS STRING)"
    scheme = ("CASE doc_id % 4 WHEN 0 THEN 'HTTPS' "
              "WHEN 1 THEN 'Https' ELSE 'https' END")
    host = ("CASE WHEN doc_id % 3 = 0 THEN UPPER(source) ELSE source END "
            "|| '.example.org'")
    port = "CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END"
    # every 11th doc gets a globally-unique path -> stays a singleton;
    # the rest fall into (source, doc_id % 40) duplicate families
    path = (f"CASE WHEN doc_id % 11 = 0 THEN '/docs/u' || {ds} "
            f"ELSE '/docs/' || CAST(doc_id % 40 AS STRING) END")
    slash = "CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END"
    real = f"'id=' || CAST(doc_id % 5 AS STRING)"
    track = (f"CASE doc_id % 6 WHEN 0 THEN 'utm_source=feed' "
             f"WHEN 1 THEN 'utm_medium=rss&utm_campaign=c' || {ds} "
             f"WHEN 2 THEN 'fbclid=fb' || {ds} "
             f"WHEN 3 THEN 'gclid=g' || {ds} ELSE '' END")
    q = (f"CASE WHEN ({track}) = '' THEN '?' || {real} "
         f"WHEN doc_id % 2 = 0 THEN '?' || ({track}) || '&' || {real} "
         f"ELSE '?' || {real} || '&' || ({track}) END")
    frag = f"CASE WHEN doc_id % 9 = 0 THEN '#sec' || {ds} ELSE '' END"
    return (f"({scheme}) || '://' || ({host}) || ({port}) || ({path}) "
            f"|| ({slash}) || ({q}) || ({frag})")


def q_url_canonical_dedup(d: S.Dialect,
                          doc_table: str = "documents") -> str:
    """URL-exact dedup on the canonical form: per canonical URL the
    duplicate count, the number of DISTINCT raw spellings collapsed
    (> 1 proves the canonicalizer did real work, not identity), the
    lowest-doc_id keeper, and the canonical HOST — the key
    `leakage_safe_split`-style host families group on.

    Scale shape: map-only canonicalization (string ops, one scan) +
    ONE url_canon-keyed aggregate; no joins, no windows.  At 100 TB
    this is the cheapest dedup rung there is — it runs before any
    content hashing because it needs no text bytes at all."""
    return f"""
        WITH urls AS (
            SELECT doc_id, {synth_url_expr(d)} AS url
            FROM {doc_table}
        ),
        {url_canon_ctes(d)}
        SELECT url_canon,
               regexp_extract(url_canon, '^[a-z][a-z0-9+.-]*://([^/?]*)', 1) AS host,
               CAST(COUNT(*) AS BIGINT) AS n_dups,
               CAST(COUNT(DISTINCT url) AS BIGINT) AS n_variants,
               CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id
        FROM canon
        GROUP BY url_canon
    """


def q_url_host_split(d: S.Dialect, seed: str = "hsplit1",
                     train_pct: int = 80, valid_pct: int = 10,
                     doc_table: str = "documents") -> str:
    """Host-family leakage-safe split: every document of the same
    CANONICAL host lands in the same train/valid/test split (one
    seeded MD5 draw per host — the `q_leakage_safe_split` rule with
    the URL host as the family key, the guard web corpora need
    because near-identical pages live under one domain).

    Map-only end to end: canonicalization is string ops, the draw
    hashes the host directly (no anchor aggregate needed — the host
    IS the family key), so nothing shuffles at all."""
    h = d.hex_to_bigint(
        f"SUBSTR(MD5(CONCAT('{seed}#', host)), 1, 12)")
    return f"""
        WITH urls AS (
            SELECT doc_id, {synth_url_expr(d)} AS url
            FROM {doc_table}
        ),
        {url_canon_ctes(d)},
        hosted AS (
            SELECT doc_id,
                   regexp_extract(url_canon, '^[a-z][a-z0-9+.-]*://([^/?]*)', 1)
                       AS host
            FROM canon
        )
        SELECT doc_id, host,
               CASE WHEN ({h} % 100) < {train_pct} THEN 'train'
                    WHEN ({h} % 100) < {train_pct + valid_pct}
                        THEN 'valid'
                    ELSE 'test' END AS split
        FROM hosted
    """
