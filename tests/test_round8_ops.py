"""Semantic tests for the round-8 operators on PLANTED data: the NFD
sequence packer must place known documents at known (seq, offset)
positions (including the oversize-split chain) and never pack worse
than the planner's one-doc-per-sequence baseline; the blocklist
filter must count OVERLAPPING matches individually while the
blocked-token accounting unions them."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dystonse_gtfs_importer_spark.functions import blocklist_sql as BLK
from dystonse_gtfs_importer_spark.operators.packing import (
    pack_sequences,
    packed_band_stats,
)


@pytest.fixture(autouse=True)
def _utc(spark):
    from dystonse_gtfs_importer_spark.session import configure_for_oracle

    configure_for_oracle(spark)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")


def _word_doc(doc_id, n_tokens):
    return (doc_id, " ".join(["w"] * n_tokens), "en", "s", n_tokens * 2)


class TestSequencePack:
    def test_planted_nfd_walk(self, spark):
        """ctx=10, one band: lengths 12,7,5,4,3,1 walk to the exact
        NFD layout, with the 12-token doc split across two chained
        sequences."""
        docs = _docs(spark, [_word_doc(i, n) for i, n in
                             enumerate([1, 3, 4, 5, 7, 12])])
        got = {r["doc_id"]: (r["band"], r["n_tokens"], r["start_seq"],
                             r["start_off"], r["n_seqs_spanned"])
               for r in pack_sequences(docs, ctx=10,
                                       band_docs=100).collect()}
        assert got == {
            5: (0, 12, 0, 0, 2),   # oversize: seqs 0-1, fill 2
            4: (0, 7, 1, 2, 1),    # fits after the split remainder
            3: (0, 5, 2, 0, 1),    # 9+5 > 10 -> new seq
            2: (0, 4, 2, 5, 1),
            1: (0, 3, 3, 0, 1),    # 9+3 > 10 -> new seq
            0: (0, 1, 3, 3, 1),
        }

    def test_zero_token_docs_excluded(self, spark):
        docs = _docs(spark, [_word_doc(0, 5), (1, "   ", "en", "s", 3)])
        rows = pack_sequences(docs, ctx=10, band_docs=10).collect()
        assert [r["doc_id"] for r in rows] == [0]

    def test_band_isolation_and_partition_invariance(self, spark):
        """Band state never crosses bands, and the result is identical
        for any input partitioning (the 100 TB property: bands pack
        independently)."""
        docs = _docs(spark, [_word_doc(i, 3 + (i * 7) % 11)
                             for i in range(40)])
        a = sorted(map(tuple, pack_sequences(
            docs.repartition(7), ctx=16, band_docs=8).collect()))
        b = sorted(map(tuple, pack_sequences(
            docs.repartition(1), ctx=16, band_docs=8).collect()))
        assert a == b
        assert {r[1] for r in a} == {i // 8 for i in range(40)}
        # every band starts its own sequence 0
        for band in {r[1] for r in a}:
            assert min(r[3] for r in a if r[1] == band) == 0

    def test_sparse_hot_ids_band_population_bounded(self, spark):
        """Round-9 banding contract: band population is EXACTLY
        band_docs regardless of id distribution.  A corpus whose ids
        are one dense hot cluster plus far-flung sparse hash-like ids
        (the case that unbounded the old doc_id DIV banding) must
        spread across ceil(n/band_docs) bands of band_docs docs each,
        and stay partition-invariant."""
        ids = ([10_000_000 + i for i in range(30)] +          # hot
               [7, 99_123, 2**40 + 13, 2**53 - 5, 123_456_789,
                987_654_321, 55, 2**31, 2**45 + 1, 31337])    # sparse
        docs = _docs(spark, [_word_doc(i, 3 + (i % 9)) for i in ids])
        packed = pack_sequences(docs.repartition(5), ctx=16,
                                band_docs=8).collect()
        by_band: dict[int, int] = {}
        for r in packed:
            by_band[r["band"]] = by_band.get(r["band"], 0) + 1
        assert sorted(by_band) == list(range(5))      # 40 docs / 8
        assert all(c == 8 for c in by_band.values())
        again = pack_sequences(docs.repartition(1), ctx=16,
                               band_docs=8).collect()
        assert sorted(map(tuple, packed)) == sorted(map(tuple, again))

    def test_sequence_fill_occupancy(self, spark):
        """The loader-facing fill table: every sequence non-empty and
        within capacity, split chunks land ctx-full, and per-band fill
        sums conserve the band's tokens."""
        from dystonse_gtfs_importer_spark.operators.packing import (
            sequence_fill,
        )

        ctx = 10
        docs = _docs(spark, [_word_doc(i, n) for i, n in
                             enumerate([1, 3, 4, 5, 7, 12])])
        packed = pack_sequences(docs, ctx=ctx, band_docs=100)
        fills = {(r["band"], r["seq"]): (r["n_docs"], r["fill_tokens"],
                                         r["pad_tokens"])
                 for r in sequence_fill(packed, ctx=ctx).collect()}
        # layout from test_planted_nfd_walk: seq0 = first 10 of the
        # 12-tok doc; seq1 = its 2-tok remainder + the 7; seq2 = 5+4;
        # seq3 = 3+1
        assert fills == {(0, 0): (1, 10, 0), (0, 1): (2, 9, 1),
                         (0, 2): (2, 9, 1), (0, 3): (2, 4, 6)}

    def test_emit_reconstructs_every_document(self, spark):
        """Concatenating a doc's chunks (offset order across its
        spanned sequences) reproduces its lowercased token stream
        exactly; per-sequence text length equals the fill."""
        from dystonse_gtfs_importer_spark.operators.packing import (
            emit_sequences,
        )

        ctx = 10
        docs = _docs(spark, [
            (0, "Zero one two THREE four five six seven eight nine "
                "ten eleven", "en", "s", 1),           # 12 tokens: split
            (1, "alpha beta gamma delta epsilon zeta eta", "en", "s", 1),
            (2, "x y z", "en", "s", 1),
        ])
        packed = pack_sequences(docs, ctx=ctx, band_docs=100)
        seqs = emit_sequences(docs, packed, ctx=ctx).collect()
        # fill == token count of the emitted text
        for r in seqs:
            assert len(r["seq_text"].split(" ")) == r["fill_tokens"]
            assert 0 < r["fill_tokens"] <= ctx
        # reconstruct each doc from its spans in (seq, offset) order
        rebuilt = {}
        for r in sorted(seqs, key=lambda r: (r["band"], r["seq"])):
            toks = r["seq_text"].split(" ")
            for span in r["spans"].split(";"):
                did, off, ln = (int(v) for v in span.split(":"))
                rebuilt.setdefault(did, []).extend(
                    toks[off:off + ln])
        originals = {r["doc_id"]:
                     [t for t in r["text"].lower().split(" ") if t]
                     for r in docs.collect()}
        assert rebuilt == originals

    def test_packed_never_worse_than_planner_baseline(self, spark):
        """The packer must RECOVER padding vs the one-doc-per-sequence
        policy q_packing_efficiency prices: per band, packed sequence
        count <= sum(ceil(n/ctx)), and all tokens are conserved."""
        ctx = 64
        docs = (spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"))
        packed = pack_sequences(docs, ctx=ctx)
        stats = {r["band"]: r for r in
                 packed_band_stats(packed, ctx=ctx).collect()}
        naive = {r["band"]: (r["naive_seqs"], r["toks"]) for r in
                 packed.groupBy("band").agg(
                     F.expr(f"sum((n_tokens + {ctx} - 1) DIV {ctx})")
                     .alias("naive_seqs"),
                     F.expr("sum(n_tokens)").alias("toks")).collect()}
        assert stats and set(stats) == set(naive)
        saved = 0
        for band, st in stats.items():
            n_naive, toks = naive[band]
            assert st["n_seqs"] <= n_naive
            assert st["total_tokens"] == toks
            assert st["padding_tokens"] == st["n_seqs"] * ctx - toks
            assert st["padding_tokens"] >= 0
            saved += n_naive - st["n_seqs"]
        assert saved > 0  # the fixture has pack-able slack


class TestBlocklistFilter:
    def _run(self, spark, docs, patterns):
        return {r["doc_id"]: r for r in
                BLK.apply_blocklist(docs, patterns).collect()}

    def test_overlapping_matches_counted_union_blocked(self, spark):
        """'a b a b a' vs {a b, b a, a b a}: six individual matches
        (overlaps included), three patterns, but the blocked-token
        union is the whole 5-token doc — no double counting."""
        docs = _docs(spark, [(1, "a b a b a", "en", "s", 9),
                             (2, "x y z", "en", "s", 5)])
        got = self._run(spark, docs, ("a b", "b a", "a b a", "zz"))
        assert (got[1]["n_matches"], got[1]["n_patterns"],
                got[1]["blocked_tokens"], got[1]["keep"]) == (6, 3, 5, 0)
        assert (got[2]["n_matches"], got[2]["n_patterns"],
                got[2]["blocked_tokens"], got[2]["keep"]) == (0, 0, 0, 1)
        assert got[1]["n_tokens"] == 5 and got[2]["n_tokens"] == 3

    def test_disjoint_islands_and_single_token(self, spark):
        """Two separated hits of a 1-token pattern block 2 tokens in
        2 islands; case-insensitive match."""
        docs = _docs(spark, [(1, "BAD x y bad", "en", "s", 11)])
        got = self._run(spark, docs, ("bad",))
        assert (got[1]["n_matches"], got[1]["blocked_tokens"],
                got[1]["keep"]) == (2, 2, 0)

    def test_adjacent_intervals_merge(self, spark):
        """Back-to-back matches [0,2) and [2,4) merge into one blocked
        region of 4 (pos == prev_max is NOT a gap)."""
        docs = _docs(spark, [(1, "p q r s", "en", "s", 7)])
        got = self._run(spark, docs, ("p q", "r s"))
        assert got[1]["blocked_tokens"] == 4
        assert got[1]["n_matches"] == 2

    def test_duplicate_patterns_rejected(self, spark):
        docs = _docs(spark, [(1, "a", "en", "s", 1)])
        with pytest.raises(ValueError):
            BLK.apply_blocklist(docs, ("a b", "A  B"))

    def test_scrub_excises_overlaps_once(self, spark):
        """'a b a b a' vs {a b, b a}: overlapping matches cover
        positions 0..4, so the whole doc is cut; disjoint hits in a
        second doc cut exactly their tokens; an untouched doc survives
        (lower-cased, single-spaced — the token identity)."""
        from dystonse_gtfs_importer_spark.functions import (
            sql_shared as S,
        )

        docs = _docs(spark, [(1, "a b a b a", "en", "s", 9),
                             (2, "x BAD y bad z", "en", "s", 13),
                             (3, "Clean   Doc", "en", "s", 11)])
        docs.createOrReplaceTempView("documents")
        got = {r["doc_id"]: r for r in spark.sql(
            BLK.q_blocklist_scrub(S.SPARK, ("a b", "b a", "bad"))
        ).collect()}
        assert (got[1]["n_removed"], got[1]["clean_text"]) == (5, "")
        assert (got[2]["n_removed"], got[2]["clean_text"]) == (2, "x y z")
        assert (got[3]["n_removed"], got[3]["clean_text"]) == (0,
                                                               "clean doc")
        assert got[2]["n_tokens"] == 5

    def test_gram_join_is_broadcast(self, spark):
        """The pattern side must broadcast — a shuffle join against a
        KB-scale blocklist would be the wrong 100 TB plan."""
        docs = _docs(spark, [(1, "a b c", "en", "s", 5)])
        plan = BLK.apply_blocklist(
            docs, ("a b", "c d e"))._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BroadcastHashJoin" in plan


class TestLshConfigPlanner:
    def test_planted_trio_counts(self, spark):
        """Three identical docs collide in EVERY band of every config,
        a token-disjoint fourth doc in none: candidate_pairs =
        n_bands * C(3,2) exactly, docs_in_candidates = 3, and probe
        volume is monotone in the band count (the planner's whole
        point: more bands -> lower threshold -> more probe work)."""
        from dystonse_gtfs_importer_spark.functions import (
            dedup_sql as D,
            sql_shared as S,
        )

        same = "alpha beta gamma delta epsilon"
        docs = _docs(spark, [(1, same, "en", "s", 1),
                             (2, same, "en", "s", 1),
                             (3, same, "en", "s", 1),
                             (4, "zeta eta theta iota kappa", "en",
                              "s", 1)])
        docs.createOrReplaceTempView("documents")
        got = {r["rows_per_band"]: r for r in spark.sql(
            D.q_lsh_config_planner(S.SPARK)).collect()}
        assert set(got) == {1, 2, 4, 8}
        for r, row in got.items():
            assert row["n_bands"] == 8 // r
            assert row["candidate_pairs"] == row["n_bands"] * 3
            assert row["docs_in_candidates"] == 3
            assert row["multi_buckets"] == row["n_bands"]
        # monotone probe volume, and the literal S-curve midpoints
        assert (got[1]["candidate_pairs"] > got[2]["candidate_pairs"]
                > got[4]["candidate_pairs"] > got[8]["candidate_pairs"])
        assert got[8]["threshold_e4"] == 10000
        assert got[2]["threshold_e4"] == 5000


class TestPrepareShards:
    """The shard-manifest writer: seeded shuffle -> token-budget
    shards -> atomic manifest.  The manifest's shard table must be a
    pure function of (corpus, seed, budget): identical across input
    partition counts and across replays."""

    def _docs(self, spark):
        return spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet")

    def test_manifest_stable_across_partitioning_and_replay(
            self, spark, tmp_path):
        import json

        from dystonse_gtfs_importer_spark.plans.corpus import (
            prepare_shards,
        )

        docs = self._docs(spark)
        r1 = prepare_shards(docs.repartition(7), str(tmp_path / "a"),
                            shard_tokens=500)
        r2 = prepare_shards(docs.repartition(1), str(tmp_path / "b"),
                            shard_tokens=500)
        assert r1["committed"] and r2["committed"]
        assert r1["shards"] == r2["shards"]
        assert r1["n_shards"] > 1
        # replay with the same batch_id: no-op, manifest byte-identical
        ma = (tmp_path / "a" / "MANIFEST").read_bytes()
        r3 = prepare_shards(docs.repartition(3), str(tmp_path / "a"),
                            shard_tokens=500)
        assert r3["committed"] is False
        assert (tmp_path / "a" / "MANIFEST").read_bytes() == ma
        # the shard table is ON the manifest (loader needs no data files)
        m = json.loads(ma)
        assert m["shards"] == r1["shards"]
        assert m["shard_tokens"] == 500 and m["seed"] == "shuf1"

    def test_loader_roundtrip_matches_manifest(self, spark, tmp_path):
        """Reading one shard through the snapshot store reproduces the
        manifest's counts and fingerprint for that shard (manifest-
        level pruning, no full-table read)."""
        import pyspark.sql.functions as F2

        from dystonse_gtfs_importer_spark.plans.corpus import (
            prepare_shards,
        )
        from dystonse_gtfs_importer_spark.sources.snapshot import (
            SnapshotStore,
        )

        docs = self._docs(spark)
        res = prepare_shards(docs, str(tmp_path / "s"), shard_tokens=500)
        store = SnapshotStore(str(tmp_path / "s"), ["shard_id"])
        target = res["shards"][1]
        got = (store.read_partitions(spark, shard_id=target["shard_id"])
               .agg(F2.count("*").alias("n"),
                    F2.sum("n_tokens").alias("t"),
                    F2.sum(F2.expr(
                        "CAST(CONV(SUBSTRING(MD5(CONCAT("
                        "CAST(doc_id AS STRING), '#', text)), 1, 8), "
                        "16, 10) AS BIGINT)")).alias("fp"))
               .collect()[0])
        assert (got["n"], got["t"], got["fp"]) == (
            target["n_docs"], target["n_tokens"], target["content_fp"])
        # shard token budget respected up to one document of overhang
        for s in res["shards"][:-1]:
            assert s["n_tokens"] >= 1

    def test_cli_prepare_shards(self, spark, tmp_path, capsys):
        import json
        import shutil

        from dystonse_gtfs_importer_spark.cli import main

        lake = tmp_path / "lake"
        lake.mkdir()
        shutil.copy("/root/testdata/sf0.001/documents.parquet",
                    lake / "documents.parquet")
        rc = main(["-s", "x", "--dir", str(lake), "corpus",
                   "prepare-shards", "--shard-tokens", "700"],
                  spark=spark)
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["committed"] is True
        assert out["total_docs"] == spark.read.parquet(
            str(lake / "documents.parquet")).count()
        assert (lake / "shards" / "MANIFEST").exists()


class TestTableProfile:
    def test_planted_nulls_distincts_minmax(self, spark):
        from dystonse_gtfs_importer_spark.functions import (
            sketch_sql as SK,
            sql_shared as S,
        )

        df = spark.createDataFrame(
            [(1, None, "a", 2.5), (2, 10, "b", None),
             (3, 10, "a", -1.25), (None, 20, None, 2.5)],
            "k long, v long, s string, x double")
        df.createOrReplaceTempView("t_prof")
        cols = (("k", "num"), ("v", "num"), ("s", "str"), ("x", "num"))
        got = {r["col_name"]: r for r in spark.sql(
            SK.q_table_profile(S.SPARK, table="t_prof", cols=cols)
        ).collect()}
        assert set(got) == {"k", "v", "s", "x"}
        for r in got.values():
            assert r["n_rows"] == 4
        assert (got["k"]["n_null"], got["k"]["n_distinct"]) == (1, 3)
        assert (got["v"]["n_null"], got["v"]["n_distinct"]) == (1, 2)
        assert (got["s"]["n_null"], got["s"]["n_distinct"]) == (1, 2)
        assert (got["x"]["min_e"], got["x"]["max_e"]) == (-1250000,
                                                          2500000)
        # strings skip min/max (collation is out of the parity contract)
        assert got["s"]["min_e"] is None and got["s"]["max_e"] is None
