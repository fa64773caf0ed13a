"""Semantic tests for the round-9 operators on PLANTED data: the FFD
packer must beat (never trail) NFD on padding while staying
deterministic and partition-invariant under its bounded open-bin
list."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dystonse_gtfs_importer_spark.operators.packing import (
    pack_sequences,
    pack_sequences_ffd,
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


class TestSequencePackFFD:
    def test_planted_ffd_recovers_nfd_waste(self, spark):
        """ctx=10, one band, lengths 9,8,7,3,2,1: NFD closes the
        9-bin when 8 misses and the 8-bin when 7 misses, wasting the
        1- and 2-slots; FFD back-fills them.  Exact layout pinned."""
        docs = _docs(spark, [_word_doc(i, n) for i, n in
                             enumerate([9, 8, 7, 3, 2, 1])])
        ffd = {r["doc_id"]: (r["start_seq"], r["start_off"],
                             r["n_seqs_spanned"])
               for r in pack_sequences_ffd(docs, ctx=10,
                                           band_docs=100).collect()}
        # walk order: 9(id5), 8(id4), 7(id3... wait ids map by length
        # _word_doc(i, n): id 0 has 1 token ... id 5 has 9? no:
        # enumerate([9,8,7,3,2,1]) -> id0:9 id1:8 id2:7 id3:3 id4:2
        # id5:1.  Decreasing walk: id0(9) id1(8) id2(7) id3(3)
        # id4(2) id5(1).
        # FFD: s0=9; s1=8; s2=7; 3 -> fits s2(7+3=10); 2 -> s1
        # (8+2=10); 1 -> s0 (9+1=10).  Zero padding.
        assert ffd == {0: (0, 0, 1), 1: (1, 0, 1), 2: (2, 0, 1),
                       3: (2, 7, 1), 4: (1, 8, 1), 5: (0, 9, 1)}
        # NFD on the same mix wastes: 9 | 8 | 7+3 | 2+1
        nfd = pack_sequences(docs, ctx=10, band_docs=100)
        nfd_seqs = max(r["start_seq"] + r["n_seqs_spanned"]
                       for r in nfd.collect())
        assert nfd_seqs == 4
        ffd_seqs = max(s + n for s, _, n in ffd.values())
        assert ffd_seqs == 3

    def test_bounded_open_bins_close_fullest(self, spark):
        """max_open=2: opening a third bin closes the FULLEST open
        bin (first on ties), so a later small doc can no longer
        back-fill it — the bounded-list rule, pinned exactly."""
        # ctx=10, walk: 9, 8, 6, 2, 1
        docs = _docs(spark, [_word_doc(i, n) for i, n in
                             enumerate([9, 8, 6, 2, 1])])
        got = {r["doc_id"]: (r["start_seq"], r["start_off"])
               for r in pack_sequences_ffd(
                   docs, ctx=10, band_docs=100, max_open=2).collect()}
        # s0=9; s1=8; 6 -> opens s2, list [9,8,6] > 2 -> close the 9
        # (fullest); 2 -> first fit among open [8,6] -> s1 (8+2);
        # 1 -> open [10?,..] s1 now 10: fits s2 (6+1).
        assert got == {0: (0, 0), 1: (1, 0), 2: (2, 0),
                       3: (1, 8), 4: (2, 6)}

    def test_oversize_chains_and_remainder_stays_open(self, spark):
        """An oversize doc chains dedicated sequences; its remainder
        chunk stays open and takes later docs first-fit."""
        docs = _docs(spark, [_word_doc(0, 23), _word_doc(1, 7),
                             _word_doc(2, 3)])
        got = {r["doc_id"]: (r["start_seq"], r["start_off"],
                             r["n_seqs_spanned"])
               for r in pack_sequences_ffd(docs, ctx=10,
                                           band_docs=100).collect()}
        # 23 -> seqs 0-2, remainder 3 open on seq 2; 7 -> fits seq 2
        # (3+7=10); 3 -> new seq 3
        assert got == {0: (0, 0, 3), 1: (2, 3, 1), 2: (3, 0, 1)}

    def test_ffd_never_worse_than_nfd_on_fixture(self, spark):
        """Padding(FFD) <= padding(NFD) per band on the driver
        fixture, with identical token conservation and both walks
        partition-invariant."""
        ctx = 64
        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet")
        nfd = packed_band_stats(
            pack_sequences(docs, ctx=ctx), ctx=ctx).collect()
        ffd = packed_band_stats(
            pack_sequences_ffd(docs, ctx=ctx), ctx=ctx).collect()
        n = {r["band"]: r for r in nfd}
        f = {r["band"]: r for r in ffd}
        assert set(n) == set(f) and n
        total_saved = 0
        for band in n:
            assert f[band]["total_tokens"] == n[band]["total_tokens"]
            assert f[band]["padding_tokens"] <= n[band]["padding_tokens"]
            total_saved += (n[band]["padding_tokens"]
                            - f[band]["padding_tokens"])
        assert total_saved > 0  # the fixture has FFD-recoverable slack

    def test_partition_invariance(self, spark):
        docs = _docs(spark, [_word_doc(i, 1 + (i * 13) % 29)
                             for i in range(60)])
        a = sorted(map(tuple, pack_sequences_ffd(
            docs.repartition(7), ctx=16, band_docs=8).collect()))
        b = sorted(map(tuple, pack_sequences_ffd(
            docs.repartition(1), ctx=16, band_docs=8).collect()))
        assert a == b


def _waterfill_ref(ns: dict[str, int], budget: int,
                   cap_e6: int) -> tuple[dict[str, int], set[str]]:
    """Independent ITERATIVE water-filler (fixpoint loop, not the
    solver's one-pass tightness-prefix derivation): re-test the cap
    condition against the current capped set until stable."""
    import math

    w = {s: math.floor(math.sqrt(n) * 1e6) for s, n in ns.items()}
    cap = {s: cap_e6 * n // 10**6 for s, n in ns.items()}
    capped: set[str] = set()
    while True:
        free = [s for s in ns if s not in capped]
        W = sum(w[s] for s in free)
        rem = budget - sum(cap[s] for s in capped)
        newly = [s for s in free if cap[s] * W < rem * w[s]]
        if not newly:
            break
        capped.update(newly)
    free = [s for s in ns if s not in capped]
    W = sum(w[s] for s in free) or 1
    rem = budget - sum(cap[s] for s in capped)
    return ({s: (cap[s] if s in capped else min(cap[s],
                                                rem * w[s] // W))
             for s in ns}, capped)


class TestMixtureWeights:
    NS = {"a": 100, "b": 400, "c": 2500, "d": 10000}
    BUDGET, CAP = 9000, 1_500_000

    def _solve(self, spark):
        from dystonse_gtfs_importer_spark.functions import (
            sampling_sql as SAMP,
            sql_shared as S,
        )

        rows = [(i, s, " ".join(["w"] * n))
                for i, (s, n) in enumerate(self.NS.items())]
        spark.createDataFrame(rows, "doc_id long, source string, "
                                    "text string") \
             .createOrReplaceTempView("documents")
        return {r["source"]: r for r in spark.sql(
            SAMP.q_mixture_weights(S.SPARK, budget=self.BUDGET,
                                   epoch_cap_e6=self.CAP)).collect()}

    def test_matches_independent_waterfill(self, spark):
        got = self._solve(spark)
        ref_alloc, ref_capped = _waterfill_ref(self.NS, self.BUDGET,
                                               self.CAP)
        assert {s: r["alloc_tok"] for s, r in got.items()} == ref_alloc
        assert {s for s, r in got.items()
                if r["capped"] == 1} == ref_capped
        # planted case exercises BOTH branches
        assert ref_capped == {"a", "b"}

    def test_achieved_mixture_hits_target_within_rounding(self, spark):
        """Uncapped allocations are pairwise proportional to the
        temperature weights within integer flooring; total spend is
        within |sources| tokens of the budget's reachable part."""
        got = self._solve(spark)
        free = [r for r in got.values() if r["capped"] == 0]
        assert len(free) >= 2
        for i in range(len(free)):
            for j in range(i + 1, len(free)):
                a, b = free[i], free[j]
                diff = abs(a["alloc_tok"] * b["w_e6"]
                           - b["alloc_tok"] * a["w_e6"])
                assert diff <= a["w_e6"] + b["w_e6"]  # flooring only
        spent = sum(r["alloc_tok"] for r in got.values())
        assert spent <= self.BUDGET
        assert self.BUDGET - spent <= len(got)  # floor leftovers only
        # epochs respect the cap and encode the rate exactly
        for r in got.values():
            assert r["epochs_e6"] <= self.CAP
            assert r["epochs_e6"] == r["alloc_tok"] * 10**6 // r["n_tok"]


class TestApplyMixture:
    def test_full_epochs_plus_deterministic_fraction(self, spark):
        """budget 300 over two 100-token sources -> 1.5 epochs each:
        every doc appears at epoch 0, and at epoch 1 exactly when its
        seeded md5 32-bit prefix clears the fractional threshold —
        verified against an INDEPENDENT hashlib recomputation."""
        import hashlib

        from dystonse_gtfs_importer_spark.plans.corpus import (
            apply_mixture,
        )

        rows = [(100 * si + i, src, "tok " * 9 + "tok", "en")
                for si, src in enumerate(["x", "y"])
                for i in range(10)]
        docs = spark.createDataFrame(
            rows, "doc_id long, source string, text string, lang string")
        out = apply_mixture(docs, budget=300, epoch_cap_e6=2_000_000,
                            id_stride=10**6).collect()
        by_epoch: dict[int, set[int]] = {}
        for r in out:
            by_epoch.setdefault(r["epoch"], set()).add(
                r["doc_id"] % 10**6)
        all_ids = {r[0] for r in rows}
        assert by_epoch[0] == all_ids            # one full epoch
        thr = (500_000 * 2**32) // 1_000_000     # frac 0.5
        expect1 = {i for i in all_ids
                   if int(hashlib.md5(f"mix1#{i}".encode())
                          .hexdigest()[:8], 16) < thr}
        assert by_epoch.get(1, set()) == expect1
        assert 2 not in by_epoch
        # minted ids unique across epochs
        assert len({r["doc_id"] for r in out}) == len(out)

    def test_cli_mixture_prepare_shards(self, spark, tmp_path, capsys):
        """corpus prepare-shards --mixture-budget: solve -> resample ->
        shard -> atomic manifest, end to end, with replay no-op."""
        import json
        import shutil

        from dystonse_gtfs_importer_spark.cli import main

        lake = tmp_path / "lake"
        lake.mkdir()
        shutil.copy("/root/testdata/sf0.001/documents.parquet",
                    lake / "documents.parquet")
        argv = ["-s", "x", "--dir", str(lake), "corpus",
                "prepare-shards", "--shard-tokens", "700",
                "--mixture-budget", "4000"]
        assert main(argv, spark=spark) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["committed"] is True
        assert out["mixture_budget"] == 4000
        # fractional epochs sample at DOCUMENT grain (deterministic
        # hash-Bernoulli), so achieved tokens land near the budget,
        # not exactly on it — the solver's alloc table is the exact
        # part, pinned in TestMixtureWeights
        assert 0.75 * 4000 <= out["total_tokens"] <= 1.25 * 4000
        assert (lake / "shards" / "MANIFEST").exists()
        # same batch id replays as a no-op with identical accounting
        assert main(argv, spark=spark) == 0
        out2 = json.loads(
            capsys.readouterr().out.strip().splitlines()[-1])
        assert out2["committed"] is False
        assert out2["shards"] == out["shards"]


class TestManifestScaleGuard:
    def test_side_table_branch_replay_and_content(self, spark, tmp_path):
        """Above max_inline_shards the shard table goes to a parquet
        side-table: manifest carries only its path + totals, content
        equals the recomputed shard stats, a same-batch replay is a
        no-op that writes NO new side table, and a fresh store
        reproduces identical rows from any input partitioning."""
        from dystonse_gtfs_importer_spark.plans.corpus import (
            prepare_shards,
            shard_stats,
            shard_assignments,
        )

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet")
        out = tmp_path / "s"
        res = prepare_shards(docs, str(out), shard_tokens=50,
                             max_inline_shards=10)
        assert res["committed"] is True
        assert "shards" not in res and res["n_shards"] > 10
        side = out / res["shards_path"]
        stats = spark.read.parquet(str(side))
        rows = sorted(map(tuple, stats.collect()))
        ref = sorted(map(tuple, shard_stats(
            shard_assignments(docs, shard_tokens=50)).collect()))
        assert rows == ref
        assert len(rows) == res["n_shards"]
        assert res["total_tokens"] == sum(r[2] for r in rows)

        # replay: detected BEFORE any work — no orphan side tables
        n_side_dirs = len(list((out / "shard_stats").iterdir()))
        res2 = prepare_shards(docs, str(out), shard_tokens=50,
                              max_inline_shards=10)
        assert res2["committed"] is False
        assert res2["n_shards"] == res["n_shards"]
        assert res2["shards_path"] == res["shards_path"]
        assert len(list((out / "shard_stats").iterdir())) == n_side_dirs

        # partition invariance of the side-table CONTENT
        res3 = prepare_shards(docs.repartition(13), str(tmp_path / "s2"),
                              shard_tokens=50, max_inline_shards=10)
        rows3 = sorted(map(tuple, spark.read.parquet(
            str(tmp_path / "s2" / res3["shards_path"])).collect()))
        assert rows3 == rows


class TestCorpusProfileCLI:
    def test_profile_exact_below_threshold(self, spark, tmp_path,
                                           capsys):
        import json
        import shutil

        from dystonse_gtfs_importer_spark.cli import main

        lake = tmp_path / "lake"
        lake.mkdir()
        shutil.copy("/root/testdata/sf0.001/documents.parquet",
                    lake / "documents.parquet")
        assert main(["-s", "x", "--dir", str(lake), "corpus",
                     "profile"], spark=spark) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["distinct_mode"] == "exact"
        cols = {c["col_name"]: c for c in out["columns"]}
        assert cols["doc_id"]["n_distinct"] == out["n_rows"]
        assert cols["doc_id"]["n_null"] == 0

    def test_profile_approx_above_threshold(self, spark, tmp_path,
                                            capsys):
        """Forcing the threshold to 0 flips the distinct rung to the
        approx (no-Expand) form; estimates stay near exact."""
        import json
        import shutil

        from dystonse_gtfs_importer_spark.cli import main

        lake = tmp_path / "lake"
        lake.mkdir()
        shutil.copy("/root/testdata/sf0.001/documents.parquet",
                    lake / "documents.parquet")
        assert main(["-s", "x", "--dir", str(lake), "corpus",
                     "profile", "--approx-threshold", "0"],
                    spark=spark) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["distinct_mode"] == "approx"
        cols = {c["col_name"]: c for c in out["columns"]}
        n = out["n_rows"]
        assert abs(cols["doc_id"]["n_distinct"] - n) <= 0.05 * n


class TestMixtureDrift:
    def test_planted_shares_and_flags(self, spark):
        """Exact integer shares: 300-token 'a' + 100-token 'b' with
        targets 1:1 -> shares 750000/250000, drift ±250000, both
        flagged; an untargeted source and a missing targeted source
        surface as pure excess / shortfall."""
        from dystonse_gtfs_importer_spark.functions import (
            sampling_sql as SAMP,
            sql_shared as S,
        )

        rows = [(1, "a", " ".join(["w"] * 300)),
                (2, "b", " ".join(["w"] * 100)),
                (3, "c", " ".join(["w"] * 0))]   # zero tokens: drops
        spark.createDataFrame(
            rows, "doc_id long, source string, text string") \
            .createOrReplaceTempView("documents")
        got = {r["source"]: r for r in spark.sql(SAMP.q_mixture_drift(
            S.SPARK, targets=(("a", 5), ("b", 5), ("ghost", 10)),
            tol_e6=100_000)).collect()}
        assert got["a"]["share_e6"] == 750_000
        assert got["a"]["target_e6"] == 250_000
        assert got["a"]["drift_e6"] == 500_000
        assert got["a"]["out_of_tol"] == 1
        assert got["b"]["share_e6"] == 250_000
        assert got["b"]["drift_e6"] == 0
        assert got["b"]["out_of_tol"] == 0
        # targeted but absent from the corpus: pure shortfall
        assert got["ghost"]["n_tok"] == 0
        assert got["ghost"]["drift_e6"] == -500_000
        assert got["ghost"]["out_of_tol"] == 1
        # a present-but-token-less source audits at zero everything
        assert (got["c"]["n_tok"], got["c"]["share_e6"],
                got["c"]["target_e6"], got["c"]["out_of_tol"]) \
            == (0, 0, 0, 0)


class TestDedupKeepBest:
    """A near-dup cluster keeps its highest-quality member even at a
    HIGHER doc_id: doc 2 repeats doc 1's token stream twice
    (identical token SET -> identical MinHash signature, a certain
    LSH pair) and scores better on the length signal.  Both
    derivations — the Spark operator composition (CC + per-cluster
    rank) and the recursive-CTE oracle — must produce that keeper
    (their row-for-row equality at sf0.01 is the driver gate)."""

    BASE = ("the quick brown fox jumps over lazy dog and runs "
            "far away tonight")
    ROWS = [(1, BASE, "en", "s", 1),
            (2, BASE + " " + BASE, "en", "s", 1),   # better length
            (3, "completely unrelated island of words here",
             "en", "s", 1)]
    SCHEMA = ("doc_id long, text string, lang string, source string, "
              "n_chars long")

    def _check(self, ref: dict) -> None:
        assert ref[1][1] == ref[2][1]              # same cluster
        assert ref[2][3] == 1 and ref[1][3] == 0   # doc 2 keeps
        assert ref[3][3] == 1                      # singleton keeps

    def test_oracle_semantics_planted(self, spark):
        import duckdb

        from dystonse_gtfs_importer_spark.plans import (
            oracle_queries as oq,
        )

        con = duckdb.connect()
        con.register("documents", spark.createDataFrame(
            self.ROWS, self.SCHEMA).toPandas())
        ref = {r[0]: r for r in con.execute(
            oq._dedup_keep_best_oracle()).fetchall()}
        self._check(ref)

    def test_operator_semantics_planted(self, spark):
        import pyspark.sql.functions as F
        from pyspark.sql.window import Window

        from dystonse_gtfs_importer_spark.functions import (
            sql_shared as S,
        )
        from dystonse_gtfs_importer_spark.functions import (
            dedup_sql as D,
        )
        from dystonse_gtfs_importer_spark.operators.graph import (
            connected_components,
        )

        docs = spark.createDataFrame(self.ROWS, self.SCHEMA)
        docs.createOrReplaceTempView("documents")
        pairs = (spark.sql(D.q_minhash_lsh_pairs(S.SPARK))
                 .where(F.col("est_jaccard") >= 0.9))
        cc = connected_components(pairs, "doc_a", "doc_b",
                                  nodes=docs.select("doc_id"))
        q = docs.selectExpr(
            "doc_id",
            f"{S.quality_score('text', S.SPARK)} AS quality")
        w = Window.partitionBy("cluster_id").orderBy(
            F.col("quality").desc(), F.col("doc_id"))
        got = {r["doc_id"]: (r["doc_id"], r["cluster_id"],
                             r["quality"], r["is_keeper"])
               for r in (cc.select(F.col("node").alias("doc_id"),
                                   F.col("component")
                                   .alias("cluster_id"))
                         .join(q, ["doc_id"])
                         .withColumn(
                             "is_keeper",
                             F.when(F.row_number().over(w) == 1, 1)
                             .otherwise(0))).collect()}
        self._check(got)


class TestWindowedMixtureDrift:
    def test_stream_matches_batch(self, spark, tmp_path):
        """Live mixture monitoring: per (event-time window, source)
        achieved share vs target with drift flags — the streaming
        plan (two chained window-keyed stateful aggregations + a
        window-equality join, legal in Spark 4's multi-stateful
        support) must equal the same plan run in batch, and the
        planted windows must flag exactly the skewed source."""
        import json

        import pyspark.sql.functions as F

        from dystonse_gtfs_importer_spark.streaming.windows import (
            windowed_mixture_drift,
        )

        src = tmp_path / "docs"
        src.mkdir()
        base = 1704096000  # 2024-01-01T08:00Z
        rows = []
        # window 1: balanced 50/50 between a and b (10 tokens each)
        for i in range(4):
            rows.append({"doc_id": i, "source": ["a", "b"][i % 2],
                         "ts": (base + i * 60) * 1000000,
                         "text": "tok " * 9 + "tok"})
        # window 2 (2h later): a floods to 3/4 of tokens
        for i in range(4):
            rows.append({"doc_id": 10 + i,
                         "source": "a" if i < 3 else "b",
                         "ts": (base + 7200 + i * 60) * 1000000,
                         "text": "tok " * 9 + "tok"})
        # tail far ahead so the watermark closes both windows
        rows.append({"doc_id": 99, "source": "a",
                     "ts": (base + 8 * 3600) * 1000000, "text": "t"})
        (src / "a.json").write_text(
            "\n".join(json.dumps(r) for r in rows))

        schema = "doc_id long, source string, ts long, text string"
        to_ts = lambda df: df.withColumn(
            "ts", F.timestamp_micros(F.col("ts")))
        targets = (("a", 1), ("b", 1))

        batch = windowed_mixture_drift(
            to_ts(spark.read.schema(schema).json(str(src))),
            targets, tol_e6=100_000)
        stream = windowed_mixture_drift(
            to_ts(spark.readStream.schema(schema).json(str(src))),
            targets, tol_e6=100_000)
        assert stream.isStreaming
        q = (stream.writeStream.format("memory").queryName("mixdrift")
             .outputMode("append")
             .option("checkpointLocation", str(tmp_path / "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = {(r.window_start_s, r.source):
               (r.n_tok, r.share_e6, r.target_e6, r.drift_e6,
                r.out_of_tol)
               for r in spark.sql("SELECT * FROM mixdrift").collect()}
        want = {(r.window_start_s, r.source):
                (r.n_tok, r.share_e6, r.target_e6, r.drift_e6,
                 r.out_of_tol)
                for r in batch.collect()
                if r.window_start_s in {k[0] for k in got}}
        assert got == want and got, (got, want)
        # planted semantics: balanced window in-tol, flooded window
        # flags BOTH sources (a +25pp, b -25pp)
        w1, w2 = sorted({k[0] for k in got})[:2]
        assert got[(w1, "a")] == (20, 500_000, 500_000, 0, 0)
        assert got[(w2, "a")] == (30, 750_000, 500_000, 250_000, 1)
        assert got[(w2, "b")][4] == 1


class TestAnnRecallAudit:
    def test_full_probe_anchor_and_monotone_curve(self, spark,
                                                  sf_correct):
        """The recall-vs-nprobe curve: probing every cell equals the
        brute-force candidate set, so the nprobe=8 leg must land at
        recall_e4 = 10000 for EVERY query (the audit's built-in
        sanity anchor), and mean recall must be non-decreasing in
        nprobe."""
        from dystonse_gtfs_importer_spark.functions import (
            ann_sql as ANN,
            sql_shared as S,
        )
        from dystonse_gtfs_importer_spark.sources.testdata import (
            register_views,
        )

        register_views(spark, sf_correct)
        rows = spark.sql(ANN.q_ann_recall(S.SPARK)).collect()
        by: dict[int, list[int]] = {}
        for r in rows:
            by.setdefault(r["nprobe"], []).append(r["recall_e4"])
        assert set(by) == {1, 2, 4, 8}
        assert all(v == 10000 for v in by[8])
        means = [sum(by[n]) / len(by[n]) for n in (1, 2, 4, 8)]
        assert means == sorted(means)
        assert means[-1] == 10000


class TestCorpusDiff:
    def test_operator_planted_statuses(self, spark):
        from dystonse_gtfs_importer_spark.plans.corpus import (
            corpus_diff,
        )

        old = spark.createDataFrame(
            [(1, "s1", "alpha beta"), (2, "s1", "gamma delta"),
             (3, "s2", "kept as is")],
            "doc_id long, source string, text string")
        new = spark.createDataFrame(
            [(1, "s1", "alpha beta"),               # unchanged
             (2, "s1", "gamma delta EDITED"),       # changed
             (3, "s2", "kept as is"),               # unchanged
             (9, "s3", "brand new doc body here")],  # added
            "doc_id long, source string, text string")
        # plus a removal: old doc 4 absent from new
        old = old.union(spark.createDataFrame(
            [(4, "s2", "goes away soon")],
            "doc_id long, source string, text string"))
        got = {(r["source"], r["status"]): (r["n_docs"], r["n_tokens"])
               for r in corpus_diff(old, new).collect()}
        assert got == {("s1", "unchanged"): (1, 2),
                       ("s1", "changed"): (1, 3),
                       ("s2", "unchanged"): (1, 3),
                       ("s2", "removed"): (1, 3),
                       ("s3", "added"): (1, 5)}


class TestCorpusMixtureCLI:
    def test_mixture_table_printed(self, spark, tmp_path, capsys):
        import json
        import shutil

        from dystonse_gtfs_importer_spark.cli import main

        lake = tmp_path / "lake"
        lake.mkdir()
        shutil.copy("/root/testdata/sf0.001/documents.parquet",
                    lake / "documents.parquet")
        assert main(["-s", "x", "--dir", str(lake), "corpus",
                     "mixture", "--budget", "4000"], spark=spark) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["budget"] == 4000
        assert out["total_alloc"] <= 4000
        assert out["sources"] and all(
            r["epochs_e6"] <= out["epoch_cap_e6"]
            for r in out["sources"])


class TestEditDistanceNearPairs:
    """Planted two-stage pipeline semantics: the token-level sketch
    recalls candidates (including permutations the verify stage must
    reject), the capped Levenshtein verify keeps only true
    character-level near-duplicates, and the capped scale form equals
    the uncapped quadratic reference."""

    TOKENS = ["aaaa", "bbbb", "cccc", "dddd", "eeee",
              "ffff", "gggg", "hhhh", "iiii", "jjjj"]

    def _corpus(self, spark):
        fwd = " ".join(self.TOKENS)
        rev = " ".join(reversed(self.TOKENS))
        other = " ".join(["zzzz", "yyyy", "xxxx", "wwww", "vvvv",
                          "uuuu", "tttt", "ssss", "rrrr", "qqqq"])
        rows = [(0, fwd, "en", "s", len(fwd)),
                (1, fwd, "en", "s", len(fwd)),        # exact duplicate
                (2, rev, "en", "s", len(rev)),        # permutation
                (3, other, "en", "s", len(other))]    # unrelated
        _docs(spark, rows).createOrReplaceTempView("documents")

    def test_verify_stage_keeps_dups_rejects_permutations(self, spark):
        from dystonse_gtfs_importer_spark.functions import dedup_sql as D
        from dystonse_gtfs_importer_spark.functions import sql_shared as S

        self._corpus(spark)
        capped = spark.sql(
            D.q_edit_distance_near_pairs_capped(S.SPARK)).collect()
        # sketch stage: identical token multisets -> hamming 0 for
        # (0,1), (0,2), (1,2); verify keeps only the exact pair
        assert {(r.doc_a, r.doc_b) for r in capped} == {(0, 1)}
        (pair,) = capped
        assert (pair.hamming, pair.edit_dist, pair.sim_e6) == (0, 0, 1000000)
        # the permutation WAS a candidate (same fingerprint) but its
        # character edit distance exceeds the 0.6-similarity budget
        cands = spark.sql(
            D.q_simhash64_near_pairs(S.SPARK)).collect()
        assert {(r.doc_a, r.doc_b) for r in cands} == {(0, 1), (0, 2), (1, 2)}

    def test_capped_equals_reference(self, spark):
        from dystonse_gtfs_importer_spark.functions import dedup_sql as D
        from dystonse_gtfs_importer_spark.functions import sql_shared as S

        self._corpus(spark)
        ref = {tuple(r) for r in
               spark.sql(D.q_edit_distance_near_pairs(S.SPARK)).collect()}
        got = {tuple(r) for r in spark.sql(
            D.q_edit_distance_near_pairs_capped(S.SPARK)).collect()}
        assert got == ref and len(ref) == 1


class TestOovRate:
    def test_planted_rates_exact(self, spark):
        from dystonse_gtfs_importer_spark.functions import sampling_sql as SAMP
        from dystonse_gtfs_importer_spark.functions import sql_shared as S

        rows = [
            # srcA: 6 tokens, vocab(top-2 global = "a", "b") covers 4
            (0, "a a b b c d", "en", "srcA", 11),
            # srcB: 4 tokens, vocab covers 1
            (1, "a c c e", "en", "srcB", 7),
        ]
        _docs(spark, rows).createOrReplaceTempView("documents")
        # global tf: a=3, b=2, c=3, d=1, e=1 -> top-2 by (tf DESC, tok)
        # = {a, c}; srcA oov = {b, b, d} = 3/6; srcB oov = {e} = 1/4
        got = {r.source: r for r in
               spark.sql(SAMP.q_oov_rate(S.SPARK, n=2)).collect()}
        a, b = got["srcA"], got["srcB"]
        assert (a.n_tok, a.n_oov_tok, a.n_types, a.n_oov_types,
                a.oov_rate_e6) == (6, 3, 4, 2, 500000)
        assert (b.n_tok, b.n_oov_tok, b.n_types, b.n_oov_types,
                b.oov_rate_e6) == (4, 1, 3, 1, 250000)


class TestRetrievalEval:
    def test_perfect_retrieval_scores_one(self, spark):
        """A query whose colliding neighbors are all same-label and
        rank at the top must score mrr = ndcg = 1.0 exactly."""
        from dystonse_gtfs_importer_spark.functions import ann_sql as ANN
        from dystonse_gtfs_importer_spark.functions import sql_shared as S

        base = [float((i * 37) % 19) - 9.0 for i in range(64)]
        rows = [(0, base, 1), (1, base, 1), (2, base, 1)]
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).createOrReplaceTempView("embeddings")
        out = spark.sql(ANN.q_retrieval_eval(S.SPARK)).collect()
        assert len(out) == 1
        (r,) = out
        assert (r.label, r.n_queries, r.mrr, r.ndcg) == (1, 1, 1.0, 1.0)


class TestHardNegativeTopk:
    def test_same_label_excluded_negatives_ranked(self, spark):
        """Identical vectors collide in every LSH table; the same-label
        copy must be filtered out and the different-label copy mined
        as the rank-1 hard negative with cosine exactly 1."""
        from dystonse_gtfs_importer_spark.functions import ann_sql as ANN
        from dystonse_gtfs_importer_spark.functions import sql_shared as S

        base = [float((i * 37) % 19) - 9.0 for i in range(64)]
        rows = [(0, base, 1),   # query (vec_id % QUERY_STRIDE == 0)
                (1, base, 1),   # same-label twin: NOT a negative
                (2, base, 2)]   # different-label twin: hard negative
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).createOrReplaceTempView("embeddings")
        out = spark.sql(ANN.q_hard_negative_topk(S.SPARK)).collect()
        assert [(r.query_id, r.query_label, r.cand_id, r.neg_label,
                 r.cosine, r.rk) for r in out] == [(0, 1, 2, 2, 1.0, 1)]


class TestCentroidSimilarityMatrix:
    def test_orthogonal_and_identical_centroids(self, spark):
        from dystonse_gtfs_importer_spark.functions import ann_sql as ANN
        from dystonse_gtfs_importer_spark.functions import sql_shared as S

        def axis(dim, scale):
            v = [0.0] * 64
            v[dim] = scale
            return v

        rows = [
            (0, axis(0, 2.0), 1), (1, axis(0, 4.0), 1),  # centroid +e0
            (2, axis(1, 3.0), 2),                        # centroid +e1
            (3, axis(0, 5.0), 3),                        # centroid +e0
        ]
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).createOrReplaceTempView("embeddings")
        got = {(r.label_a, r.label_b):
               (r.n_a, r.n_b, r.centroid_cosine)
               for r in spark.sql(
                   ANN.q_centroid_similarity_matrix(S.SPARK)).collect()}
        assert got == {(1, 2): (2, 1, 0.0),
                       (1, 3): (2, 1, 1.0),
                       (2, 3): (1, 1, 0.0)}


class TestPiiSourceReport:
    def test_planted_counts_and_density(self, spark):
        from dystonse_gtfs_importer_spark.functions import pii_sql as PII
        from dystonse_gtfs_importer_spark.functions import sql_shared as S

        rows = [
            # 1 URL + 1 email; n_chars planted to 100 for easy density
            (0, "see https://ex.com and mail bob@ex.com please",
             "en", "srcA", 100),
            # clean
            (1, "nothing sensitive here", "en", "srcA", 100),
            # 1 IP + 1 phone
            (2, "host 10.0.0.1 call +49 30 123456 now", "en", "srcB", 50),
        ]
        _docs(spark, rows).createOrReplaceTempView("documents")
        got = {r.source: r for r in spark.sql(
            PII.q_pii_source_report(S.SPARK)).collect()}
        a, b = got["srcA"], got["srcB"]
        assert (a.n_docs, a.n_clean_docs, a.clean_share) == (2, 1, 0.5)
        assert (a.n_url, a.n_email, a.n_ip, a.n_phone, a.n_pii) == \
            (1, 1, 0, 0, 2)
        # 2 matches over 200 chars -> 100 per 10k
        assert a.pii_per_10k_chars == 100.0
        assert (b.n_docs, b.n_clean_docs, b.clean_share) == (1, 0, 0.0)
        assert (b.n_url, b.n_email, b.n_ip, b.n_phone, b.n_pii) == \
            (0, 0, 1, 1, 2)
        assert b.pii_per_10k_chars == 400.0


class TestNormalizedDedup:
    def test_casing_punct_whitespace_collapse(self, spark):
        from dystonse_gtfs_importer_spark.functions import dedup_sql as D
        from dystonse_gtfs_importer_spark.functions import sql_shared as S

        rows = [
            (0, "Hello, World!", "en", "s", 13),
            (1, "hello world", "en", "s", 11),
            (2, "  HELLO   world  ", "en", "s", 17),
            (3, "something else", "en", "s", 14),
        ]
        _docs(spark, rows).createOrReplaceTempView("documents")
        out = spark.sql(D.q_normalized_dedup(S.SPARK)).collect()
        by_size = sorted(out, key=lambda r: -r.n_members)
        assert [(r.canonical_doc, r.n_members, r.max_member)
                for r in by_size] == [(0, 3, 2), (3, 1, 3)]
        # raw exact dedup sees NO duplicates on the same corpus
        exact = spark.sql(
            "SELECT COUNT(*) c FROM (SELECT MD5(text) h FROM documents "
            "GROUP BY 1 HAVING COUNT(*) > 1)").collect()
        assert exact[0].c == 0


class TestDedupImpact:
    def test_cross_source_removal_attribution(self, spark):
        from dystonse_gtfs_importer_spark.functions import dedup_sql as D
        from dystonse_gtfs_importer_spark.functions import sql_shared as S

        dup = "same text"
        rows = [
            (0, dup, "en", "srcA", 40),           # keeper (min doc_id)
            (1, dup, "en", "srcB", 40),           # removed
            (2, dup, "en", "srcB", 40),           # removed
            (3, "unique one", "en", "srcB", 20),  # kept
        ]
        _docs(spark, rows).createOrReplaceTempView("documents")
        got = {r.source: r for r in spark.sql(
            D.q_dedup_impact(S.SPARK)).collect()}
        a, b = got["srcA"], got["srcB"]
        assert (a.n_docs, a.n_docs_removed, a.doc_removal_share) == (1, 0, 0.0)
        assert (a.n_chars, a.n_chars_removed, a.char_removal_share) == \
            (40, 0, 0.0)
        assert (b.n_docs, b.n_docs_removed, b.doc_removal_share) == \
            (3, 2, 0.6667)
        assert (b.n_chars, b.n_chars_removed, b.char_removal_share) == \
            (100, 80, 0.8)


class TestReadabilityScores:
    def test_planted_integer_counts_and_score(self, spark):
        from dystonse_gtfs_importer_spark.functions import sampling_sql as SAMP
        from dystonse_gtfs_importer_spark.functions import sql_shared as S

        # "a b c. d e!": 5 words, 2 sentence terminators, vowel runs
        # {a, e} = 2 -> syllable floor lifts to 5 (one per word)
        rows = [(0, "a b c. d e!", "en", "srcA", 11)]
        _docs(spark, rows).createOrReplaceTempView("documents")
        (r,) = spark.sql(SAMP.q_readability_scores(S.SPARK)).collect()
        assert (r.source, r.n_docs, r.n_words, r.n_sentences,
                r.n_syllables) == ("srcA", 1, 5, 2, 5)
        # 206.835 - 1.015*(5/2) - 84.6*(5/5) = 119.6975 -> easy tier
        assert r.flesch_ease == 119.6975
        assert (r.n_hard, r.n_medium, r.n_easy) == (0, 0, 1)

    def test_syllable_heavy_prose_scores_lower(self, spark):
        from dystonse_gtfs_importer_spark.functions import sampling_sql as SAMP
        from dystonse_gtfs_importer_spark.functions import sql_shared as S

        rows = [(0, "aia aia aia.", "en", "hard", 12),   # 2 runs/word
                (1, "go on. be ok.", "en", "easy", 13)]  # 1 run/word
        _docs(spark, rows).createOrReplaceTempView("documents")
        got = {r.source: r.flesch_ease for r in spark.sql(
            SAMP.q_readability_scores(S.SPARK)).collect()}
        assert got["hard"] < got["easy"]


class TestProductQuantization:
    """Planted PQ semantics: duplicate vectors of the 4 seed patterns
    must share the seed's code in every subspace with zero
    reconstruction error, and ADC must rank a query's exact twin
    first at integer distance 0."""

    def _corpus(self, spark):
        rows = [(i, [float(i % 4 + 1)] * 64, 0) for i in range(8)]
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).createOrReplaceTempView("embeddings")

    def test_codes_and_recon_error(self, spark):
        from dystonse_gtfs_importer_spark.functions import ann_sql as ANN
        from dystonse_gtfs_importer_spark.functions import sql_shared as S

        self._corpus(spark)
        out = spark.sql(ANN.q_pq_codes(S.SPARK)).collect()
        assert len(out) == 8 * ANN.PQ_M
        for r in out:
            # vec i and i+4 share pattern i -> code i, exact centroid
            assert r.code == r.vec_id % 4
            assert r.recon_err == 0.0

    def test_adc_ranks_exact_twin_first(self, spark):
        from dystonse_gtfs_importer_spark.functions import ann_sql as ANN
        from dystonse_gtfs_importer_spark.functions import sql_shared as S

        self._corpus(spark)
        out = spark.sql(ANN.q_ann_pq_topk(S.SPARK)).collect()
        by_rank = {r.rk: r for r in out if r.query_id == 0}
        assert by_rank[1].cand_id == 4 and by_rank[1].adist_e6 == 0
        assert all(r.adist_e6 > 0 for rk, r in by_rank.items() if rk > 1)


class TestTokenizerFertility:
    def test_planted_micro_unit_rates(self, spark):
        from dystonse_gtfs_importer_spark.functions import sampling_sql as SAMP
        from dystonse_gtfs_importer_spark.functions import sql_shared as S

        rows = [
            # "ab12cd." -> BPE pre-tokens [ab][12][cd][.] = 4, 1 word
            (0, "ab12cd.", "xx", "s", 7),
            # plain prose: 2 words = 2 pre-tokens
            (1, "hello world", "en", "s", 11),
        ]
        _docs(spark, rows).createOrReplaceTempView("documents")
        got = {r.lang: r for r in spark.sql(
            SAMP.q_tokenizer_fertility(S.SPARK)).collect()}
        xx, en = got["xx"], got["en"]
        assert (xx.n_words, xx.n_bpe_tokens, xx.n_chars) == (1, 4, 7)
        assert xx.fertility_e6 == 4_000_000
        assert xx.chars_per_token_e6 == 1_750_000
        assert (en.n_words, en.n_bpe_tokens) == (2, 2)
        assert en.fertility_e6 == 1_000_000


class TestQualityCalibration:
    def test_planted_percentiles_and_shares(self, spark):
        from dystonse_gtfs_importer_spark.functions import sampling_sql as SAMP
        from dystonse_gtfs_importer_spark.functions import sql_shared as S

        # alpha ratio and stopword signal constant; only the length
        # signal varies -> scores strictly ordered by text length
        rows = [
            (0, "aa", "en", "srcA", 2),
            (1, "aaaa", "en", "srcA", 4),
            (2, "aaaaaa", "en", "srcA", 6),
            (3, "a" * 20, "en", "srcB", 20),  # highest score of all
        ]
        _docs(spark, rows).createOrReplaceTempView("documents")
        scores = {r.doc_id: int(round(r.quality * 10000))
                  for r in spark.sql(
                      "SELECT doc_id, "
                      + S.quality_score("text", S.SPARK)
                      + " AS quality FROM documents").collect()}
        assert scores[0] < scores[1] < scores[2] < scores[3]
        got = {r.source: r for r in spark.sql(
            SAMP.q_quality_calibration(S.SPARK)).collect()}
        a, b = got["srcA"], got["srcB"]
        assert (a.n_docs, a.p10_e4, a.p50_e4, a.p90_e4) == \
            (3, scores[0], scores[1], scores[2])
        # global median over 4 docs = 2nd smallest score
        assert a.global_p50_e4 == scores[1]
        assert (a.pass_local_share, a.pass_global_share) == (0.6667, 0.6667)
        assert (b.n_docs, b.p10_e4, b.p50_e4, b.p90_e4) == \
            (1, scores[3], scores[3], scores[3])
        assert (b.pass_local_share, b.pass_global_share) == (1.0, 1.0)


class TestIvfPqAndRecall:
    """Planted IVF-PQ semantics: on the duplicate-pattern corpus the
    codebooks reconstruct exactly, so ADC ordering equals exact L2
    ordering and BOTH recall legs must read 10000 — and the IVF
    pruning loses nothing because every vector lands in one coarse
    cell."""

    def _corpus(self, spark):
        rows = [(i, [float(i % 4 + 1)] * 64, 0) for i in range(8)]
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).createOrReplaceTempView("embeddings")

    def test_ivfpq_exact_twin_first(self, spark):
        from dystonse_gtfs_importer_spark.functions import ann_sql as ANN
        from dystonse_gtfs_importer_spark.functions import sql_shared as S

        self._corpus(spark)
        out = spark.sql(ANN.q_ann_ivfpq_topk(S.SPARK)).collect()
        by_rank = {r.rk: r for r in out if r.query_id == 0}
        assert by_rank[1].cand_id == 4 and by_rank[1].adist_e6 == 0

    def test_recall_perfect_on_exact_codebooks(self, spark):
        from dystonse_gtfs_importer_spark.functions import ann_sql as ANN
        from dystonse_gtfs_importer_spark.functions import sql_shared as S

        self._corpus(spark)
        out = spark.sql(ANN.q_pq_recall(S.SPARK)).collect()
        assert {r.variant for r in out} == {"pq_flat", "ivfpq"}
        for r in out:
            assert (r.n_hit, r.recall_e4) == (r.k_eval, 10000), r

    def test_fixture_recall_rows_well_formed(self, spark, sf_smoke):
        """On real (random) fixture embeddings: both legs cover the
        same query set with full k evaluated and hits within range.
        (Per-query recall(ivfpq) <= recall(pq_flat) is NOT an
        invariant — pruning can evict false positives that out-ranked
        a true hit — so only structure is pinned here; the exact-
        codebook equality case above pins the semantics.)"""
        from dystonse_gtfs_importer_spark.functions import ann_sql as ANN
        from dystonse_gtfs_importer_spark.functions import sql_shared as S
        from dystonse_gtfs_importer_spark.sources.testdata import (
            register_views,
        )

        register_views(spark, sf_smoke)
        rows = spark.sql(ANN.q_pq_recall(S.SPARK)).collect()
        flat = {r.query_id: r for r in rows if r.variant == "pq_flat"}
        ivf = {r.query_id: r for r in rows if r.variant == "ivfpq"}
        assert set(flat) == set(ivf) and flat
        for r in rows:
            assert r.k_eval == ANN.K
            assert 0 <= r.n_hit <= r.k_eval
            assert r.recall_e4 == r.n_hit * 10000 // r.k_eval


class TestCorpusReportCLIs:
    def test_calibrate_fertility_pii_json(self, spark, tmp_path, capsys):
        import json

        from dystonse_gtfs_importer_spark.cli import main

        rows = [
            (0, "see https://ex.com now", "en", "srcA", 100),
            (1, "plain prose here. ok!", "en", "srcA", 100),
            (2, "ab12cd.", "xx", "srcB", 7),
        ]
        docs = _docs(spark, rows)
        path = str(tmp_path / "docs.parquet")
        docs.write.parquet(path)
        for mode, key, n_expected in (("calibrate", "source", 2),
                                      ("fertility", "lang", 2),
                                      ("pii-report", "source", 2),
                                      ("charclass", "source", 2),
                                      ("lengths", "source", 2)):
            assert main(["-s", "x", "--dir", str(tmp_path), "corpus",
                         mode, "--docs", path], spark=spark) == 0
            out = json.loads(
                capsys.readouterr().out.strip().splitlines()[-1])
            assert out["report"] == mode
            assert len(out["rows"]) == n_expected
        # spot-check one semantic per face
        assert main(["-s", "x", "--dir", str(tmp_path), "corpus",
                     "pii-report", "--docs", path], spark=spark) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        by_src = {r["source"]: r for r in out["rows"]}
        assert by_src["srcA"]["n_url"] == 1
        assert by_src["srcB"]["n_pii"] == 0


class TestDedupThresholdSweep:
    def test_planted_grid_accounting(self, spark):
        from dystonse_gtfs_importer_spark.functions import dedup_sql as D
        from dystonse_gtfs_importer_spark.functions import sql_shared as S

        rows = [
            (0, "a b c d", "en", "s", 7),    # pair with 1 at J = 1.0
            (1, "a b c d", "en", "s", 7),
            (2, "a b c x", "en", "s", 7),    # J(0,2) = 3/5 = 0.6 < 0.7
            (3, "z y w v", "en", "s", 7),    # unrelated
        ]
        _docs(spark, rows).createOrReplaceTempView("documents")
        out = {r.t_e4: r for r in spark.sql(
            D.q_dedup_threshold_sweep(S.SPARK)).collect()}
        assert sorted(out) == [7000, 7500, 8000, 8500, 9000]
        for t, r in out.items():
            # only the exact pair (0,1) clears every grid threshold
            assert (r.n_pairs, r.n_docs_affected, r.n_docs_removed) == \
                (1, 2, 1), (t, r)
            assert r.n_chars_removed == 7
            assert (r.doc_removal_share, r.char_removal_share) == \
                (0.25, 0.25)

    def test_lower_floor_catches_the_060_pair(self, spark):
        from dystonse_gtfs_importer_spark.functions import dedup_sql as D
        from dystonse_gtfs_importer_spark.functions import sql_shared as S

        rows = [
            (0, "a b c d", "en", "s", 7),
            (1, "a b c d", "en", "s", 7),
            (2, "a b c x", "en", "s", 7),
            (3, "z y w v", "en", "s", 7),
        ]
        _docs(spark, rows).createOrReplaceTempView("documents")
        out = {r.t_e4: r for r in spark.sql(D.q_dedup_threshold_sweep(
            S.SPARK, t_min_e4=6000, step_e4=2000, n_steps=2)).collect()}
        # at 0.6: pairs (0,1) J=1.0, (0,2) and (1,2) J=0.6 -> docs 1,2
        # removed (each has a smaller-id partner); at 0.8 only (0,1)
        assert (out[6000].n_pairs, out[6000].n_docs_removed) == (3, 2)
        assert (out[8000].n_pairs, out[8000].n_docs_removed) == (1, 1)


class TestBatchSchedule:
    def test_planted_walk_and_caps(self, spark):
        """max_tokens=20, max_seqs=3: padded cost (count x batch max)
        gates membership, the row cap forces a final singleton."""
        from dystonse_gtfs_importer_spark.operators.packing import (
            batch_stats,
            schedule_batches,
        )

        docs = _docs(spark, [_word_doc(i, n) for i, n in
                             enumerate([9, 8, 5, 5, 2, 1])])
        got = {r["doc_id"]: (r["batch"], r["pos"])
               for r in schedule_batches(
                   docs, max_tokens=20, max_seqs=3,
                   band_docs=100).collect()}
        # walk 9,8 | 5,5,2 | 1:  3*9=27 > 20 closes batch 0;
        # 4 rows > max_seqs closes batch 1
        assert got == {0: (0, 0), 1: (0, 1), 2: (1, 0),
                       3: (1, 1), 4: (1, 2), 5: (2, 0)}
        stats = {r["batch"]: r for r in batch_stats(schedule_batches(
            docs, max_tokens=20, max_seqs=3, band_docs=100)).collect()}
        b1 = stats[1]
        assert (b1["n_rows"], b1["max_len"], b1["real_tokens"],
                b1["padded_cost"], b1["pad_tokens"]) == (3, 5, 12, 15, 3)

    def test_oversize_doc_sits_alone(self, spark):
        from dystonse_gtfs_importer_spark.operators.packing import (
            schedule_batches,
        )

        docs = _docs(spark, [_word_doc(0, 25), _word_doc(1, 3)])
        got = {r["doc_id"]: (r["batch"], r["pos"])
               for r in schedule_batches(
                   docs, max_tokens=10, max_seqs=4,
                   band_docs=100).collect()}
        assert got == {0: (0, 0), 1: (1, 0)}

    def test_cost_cap_invariant_on_fixture(self, spark):
        """Every multi-row batch respects the padded-cost and row
        caps; singletons may exceed only via a single oversize doc."""
        from dystonse_gtfs_importer_spark.functions.decontam_sql import (
            BATCH_MAX_SEQS,
            BATCH_MAX_TOKENS,
        )
        from dystonse_gtfs_importer_spark.operators.packing import (
            batch_stats,
            schedule_batches,
        )

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet")
        rows = batch_stats(schedule_batches(docs)).collect()
        assert rows
        for r in rows:
            assert r["n_rows"] <= BATCH_MAX_SEQS
            if r["n_rows"] > 1:
                assert r["padded_cost"] <= BATCH_MAX_TOKENS

    def test_partition_invariance(self, spark):
        from dystonse_gtfs_importer_spark.operators.packing import (
            schedule_batches,
        )

        docs = _docs(spark, [_word_doc(i, 1 + (i * 13) % 29)
                             for i in range(60)])
        a = sorted(map(tuple, schedule_batches(
            docs.repartition(7), band_docs=8).collect()))
        b = sorted(map(tuple, schedule_batches(
            docs.repartition(1), band_docs=8).collect()))
        assert a == b


class TestSequenceLossMask:
    def test_planted_mask_propagation(self, spark):
        """ctx=10, one band, lengths 9,8,7,3 -> NFD layout 9|8|7+3;
        masking docs 0 and 3 must mask exactly seq 0 fully and 3 of
        seq 2's 10 fill tokens."""
        from dystonse_gtfs_importer_spark.operators.packing import (
            pack_sequences,
            sequence_loss_mask,
        )

        docs = _docs(spark, [_word_doc(i, n) for i, n in
                             enumerate([9, 8, 7, 3])])
        flags = spark.createDataFrame(
            [(0, 1), (1, 0), (2, 0), (3, 1)], "doc_id long, masked int")
        packed = pack_sequences(docs, ctx=10, band_docs=100)
        out = {r["seq"]: r for r in
               sequence_loss_mask(packed, flags, ctx=10).collect()}
        assert (out[0]["fill_tokens"], out[0]["masked_tokens"],
                out[0]["kept_tokens"]) == (9, 9, 0)
        assert (out[1]["fill_tokens"], out[1]["masked_tokens"]) == (8, 0)
        assert (out[2]["n_docs"], out[2]["n_masked_docs"],
                out[2]["fill_tokens"], out[2]["masked_tokens"],
                out[2]["kept_tokens"]) == (2, 1, 10, 3, 7)

    def test_split_doc_chunks_all_masked(self, spark):
        """A masked oversize doc masks ctx tokens in every spanned
        sequence and the remainder in the last."""
        from dystonse_gtfs_importer_spark.operators.packing import (
            pack_sequences,
            sequence_loss_mask,
        )

        docs = _docs(spark, [_word_doc(0, 23)])
        flags = spark.createDataFrame([(0, 1)], "doc_id long, masked int")
        packed = pack_sequences(docs, ctx=10, band_docs=100)
        out = {r["seq"]: (r["fill_tokens"], r["masked_tokens"])
               for r in sequence_loss_mask(packed, flags,
                                           ctx=10).collect()}
        assert out == {0: (10, 10), 1: (10, 10), 2: (3, 3)}

    def test_flag_rule_complements_calibration(self, spark, sf_smoke):
        """The registered flag rule is exactly the complement of
        quality_calibration's pass_local set: per source, masked
        share == 1 - pass_local_share."""
        from dystonse_gtfs_importer_spark.functions import (
            sampling_sql as SAMP,
            sql_shared as S,
        )
        from dystonse_gtfs_importer_spark.sources.testdata import (
            register_views,
        )

        register_views(spark, sf_smoke)
        flags = spark.sql(SAMP.q_below_median_quality_flags(S.SPARK))
        docs = spark.table("documents").select("doc_id", "source")
        masked_share = {
            r["source"]: r["ms"] for r in
            flags.join(docs, "doc_id").groupBy("source")
            .agg(F.expr("ROUND(AVG(CAST(masked AS DOUBLE)), 4)")
                 .alias("ms")).collect()}
        cal = {r.source: r.pass_local_share for r in spark.sql(
            SAMP.q_quality_calibration(S.SPARK)).collect()}
        assert set(masked_share) == set(cal)
        for src in cal:
            assert abs(masked_share[src] - round(1 - cal[src], 4)) < 1e-9


class TestLogregQualityIter2:
    def test_separable_planted_data_learns_perfectly(self, spark):
        """Balanced classes, identical length/alpha features, label
        carried entirely by the stopword signal: two GD steps must
        put positive weight on stop_signal, negative on bias, and
        classify the training set perfectly."""
        from dystonse_gtfs_importer_spark.functions import (
            sampling_sql as SAMP,
            sql_shared as S,
        )

        rows = []
        for i in range(5):
            rows.append((i, "the the the", "en", "s", 11))
            rows.append((5 + i, "zzz zzz zzz", "xx", "s", 11))
        _docs(spark, rows).createOrReplaceTempView("documents")
        got = {r.feature: r for r in spark.sql(
            SAMP.q_logreg_quality_iter2(S.SPARK)).collect()}
        assert set(got) == {"bias", "len_signal", "alpha_ratio",
                            "stop_signal"}
        assert got["stop_signal"].w_iter2_e6 > 0
        assert got["bias"].w_iter2_e6 < 0
        accs = {r.acc_e4 for r in got.values()}
        assert accs == {10000}

    def test_fixture_degenerates_to_base_rate(self, spark, sf_smoke):
        """On the near-inseparable fixture features, two GD steps from
        zero land on the majority predictor — accuracy equals the
        all-negative base rate exactly (an honest learned-filter
        review outcome: don't ship this classifier)."""
        from dystonse_gtfs_importer_spark.functions import (
            sampling_sql as SAMP,
            sql_shared as S,
        )
        from dystonse_gtfs_importer_spark.sources.testdata import (
            register_views,
        )

        register_views(spark, sf_smoke)
        base = spark.sql(
            "SELECT CAST(10000 * SUM(CASE WHEN lang = 'en' THEN 0 "
            "ELSE 1 END) / COUNT(*) AS INT) AS b FROM documents"
        ).collect()[0].b
        accs = {r.acc_e4 for r in spark.sql(
            SAMP.q_logreg_quality_iter2(S.SPARK)).collect()}
        assert accs == {base}


class TestPlanDedupCLI:
    def test_sweep_json(self, spark, tmp_path, capsys):
        import json

        from dystonse_gtfs_importer_spark.cli import main

        rows = [(i, "a b c d e f", "en", "s", 11) for i in range(4)]
        docs = _docs(spark, rows)
        path = str(tmp_path / "docs.parquet")
        docs.write.parquet(path)
        assert main(["-s", "x", "--dir", str(tmp_path), "corpus",
                     "plan-dedup", "--docs", path], spark=spark) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["report"] == "plan-dedup"
        grid = {r["t_e4"]: r for r in out["rows"]}
        assert sorted(grid) == [5000, 6250, 7500, 8750]
        # 4 identical docs: all 6 pairs at estimate 1.0, 3 removed
        for r in grid.values():
            assert (r["n_pairs"], r["n_docs_removed"]) == (6, 3)


class TestShuffleRunAudit:
    def test_planted_runs_exact(self, spark):
        """Verify run counting against a hand-walked order: compute
        the seeded order, count the runs by eye (in code), and the
        audit must agree; expected_runs uses the closed form."""
        from dystonse_gtfs_importer_spark.functions import (
            sampling_sql as SAMP,
            sql_shared as S,
        )

        rows = [(i, f"doc {i}", "en", "A" if i < 4 else "B", 5)
                for i in range(8)]
        _docs(spark, rows).createOrReplaceTempView("documents")
        order = [(r.position, r.doc_id) for r in spark.sql(
            SAMP.q_seeded_shuffle(S.SPARK)).collect()]
        src = {i: ("A" if i < 4 else "B") for i in range(8)}
        seq = [src[doc] for _, doc in sorted(order)]
        runs = {"A": 0, "B": 0}
        for i, s_ in enumerate(seq):
            if i == 0 or seq[i - 1] != s_:
                runs[s_] += 1
        got = {r.source: r for r in spark.sql(
            SAMP.q_shuffle_run_audit(S.SPARK)).collect()}
        for s_ in ("A", "B"):
            assert got[s_].n_docs == 4
            assert got[s_].n_runs == runs[s_]
            # E[runs] = n_s * (N - n_s + 1) / N = 4 * 5 / 8 = 2.5
            assert got[s_].expected_runs == 2.5

    def test_fully_clumped_order_flags_low_ratio(self, spark):
        """A corpus where one source's docs hash adjacently must show
        run_ratio < 1 for it; sanity: a single-doc source always has
        exactly one run and ratio 1/expected."""
        from dystonse_gtfs_importer_spark.functions import (
            sampling_sql as SAMP,
            sql_shared as S,
        )

        rows = [(0, "only", "en", "solo", 4)] + \
               [(i, f"x {i}", "en", "big", 4) for i in range(1, 9)]
        _docs(spark, rows).createOrReplaceTempView("documents")
        got = {r.source: r for r in spark.sql(
            SAMP.q_shuffle_run_audit(S.SPARK)).collect()}
        solo = got["solo"]
        assert (solo.n_docs, solo.n_runs) == (1, 1)
        # E[runs] for n_s=1: (N - 1 + 1)/N = 1 exactly
        assert solo.expected_runs == 1.0 and solo.run_ratio == 1.0


class TestDecontaminationReport:
    def test_planted_contamination_rollup(self, spark):
        """doc_id % EVAL_STRIDE == 0 is the eval set.  A training doc
        copying an eval doc's text must be flagged; clean sources
        report zero."""
        from dystonse_gtfs_importer_spark.functions import (
            decontam_sql as DC,
            sql_shared as S,
        )

        eval_text = " ".join(f"w{i}" for i in range(12))
        rows = [
            (0, eval_text, "en", "evalset", 50),         # eval doc
            (1, eval_text, "en", "dirty", 50),           # verbatim copy
            (2, "totally different words here now ok yes maybe so",
             "en", "clean", 48),
        ]
        _docs(spark, rows).createOrReplaceTempView("documents")
        got = {r.source: r for r in spark.sql(
            DC.q_decontamination_report(S.SPARK)).collect()}
        assert "evalset" not in got  # eval rows are not training rows
        dirty, clean = got["dirty"], got["clean"]
        assert (dirty.n_train_docs, dirty.n_contaminated,
                dirty.contaminated_share) == (1, 1, 1.0)
        assert dirty.n_shared_ngrams > 0
        assert (dirty.n_chars_flagged, dirty.char_flag_share) == (50, 1.0)
        assert (clean.n_contaminated, clean.n_shared_ngrams,
                clean.char_flag_share) == (0, 0, 0.0)


class TestCorpusPackCLI:
    def test_pack_emit_roundtrip(self, spark, tmp_path, capsys):
        import json

        from dystonse_gtfs_importer_spark.cli import main

        docs = _docs(spark, [_word_doc(i, n) for i, n in
                             enumerate([9, 8, 7, 3, 2, 1])])
        path = str(tmp_path / "docs.parquet")
        docs.write.parquet(path)
        assert main(["-s", "x", "--dir", str(tmp_path), "corpus",
                     "pack", "--docs", path, "--ctx", "10", "--ffd",
                     "--emit"], spark=spark) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        # FFD on 9,8,7,3,2,1 at ctx=10 packs perfectly: 3 sequences
        assert (out["algo"], out["ctx"], out["n_docs"],
                out["n_seqs"]) == ("ffd", 10, 6, 3)
        assert (out["total_tokens"], out["padding_tokens"],
                out["fill_share"]) == (30, 0, 1.0)
        placements = spark.read.parquet(out["placements"])
        assert placements.count() == 6
        seqs = spark.read.parquet(out["sequences"]).collect()
        # token conservation through the emitted streams
        assert sum(r["fill_tokens"] for r in seqs) == 30
        assert all(len(r["seq_text"].split(" ")) == r["fill_tokens"]
                   for r in seqs)

    def test_pack_nfd_default(self, spark, tmp_path, capsys):
        import json

        from dystonse_gtfs_importer_spark.cli import main

        docs = _docs(spark, [_word_doc(i, n) for i, n in
                             enumerate([9, 8, 7, 3, 2, 1])])
        path = str(tmp_path / "docs.parquet")
        docs.write.parquet(path)
        assert main(["-s", "x", "--dir", str(tmp_path), "corpus",
                     "pack", "--docs", path, "--ctx", "10"],
                    spark=spark) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        # NFD wastes: 9 | 8 | 7+3 | 2+1 -> 4 sequences
        assert (out["algo"], out["n_seqs"], out["padding_tokens"]) == \
            ("nfd", 4, 10)


class TestEmbeddingExactDedup:
    def test_duplicate_vectors_cluster(self, spark):
        from dystonse_gtfs_importer_spark.functions import ann_sql as ANN
        from dystonse_gtfs_importer_spark.functions import sql_shared as S

        v1 = [float(i) / 7.0 for i in range(64)]
        v2 = [float(i) / 7.0 + 1e-3 for i in range(64)]  # distinct
        rows = [(0, v1, 0), (1, v1, 0), (2, v2, 0)]
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).createOrReplaceTempView("embeddings")
        out = sorted(spark.sql(ANN.q_embedding_exact_dedup(
            S.SPARK)).collect(), key=lambda r: -r.n_copies)
        assert [(r.canonical_vec, r.n_copies, r.max_member)
                for r in out] == [(0, 2, 1), (2, 1, 2)]


class TestCorpusPipelineE2E:
    def test_mixture_shards_pack_chain(self, spark, tmp_path, capsys):
        """The full corpus-prep flow through the CLI faces: solve +
        apply a mixture budget into shards, then pack the same corpus
        and cross-check the accounting between independent stages."""
        import json
        import shutil

        from dystonse_gtfs_importer_spark.cli import main

        lake = tmp_path / "lake"
        lake.mkdir()
        shutil.copy("/root/testdata/sf0.001/documents.parquet",
                    lake / "documents.parquet")

        assert main(["-s", "x", "--dir", str(lake), "corpus",
                     "prepare-shards", "--mixture-budget", "9000",
                     "--shard-tokens", "1500"], spark=spark) == 0
        shards = json.loads(
            capsys.readouterr().out.strip().splitlines()[-1])
        assert shards["committed"] is True
        assert shards["mixture_budget"] == 9000
        assert 0 < shards["total_tokens"] <= 9000

        assert main(["-s", "x", "--dir", str(lake), "corpus",
                     "pack", "--ffd", "--emit"], spark=spark) == 0
        pack = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        # pack runs on the RAW corpus: its token total must equal the
        # corpus token count the profile sees, independent of mixture
        n_tok = spark.sql(
            "SELECT SUM(size(filter(split(lower(text), ' +'), "
            "t -> t <> ''))) AS n FROM parquet.`{}`".format(
                lake / "documents.parquet")).collect()[0].n
        assert pack["total_tokens"] == n_tok
        assert pack["fill_share"] > 0.5
        seqs = spark.read.parquet(pack["sequences"])
        assert seqs.count() == sum(
            r.n for r in spark.read.parquet(pack["placements"])
            .groupBy("band")
            .agg((F.max(F.col("start_seq") + F.col("n_seqs_spanned")))
                 .alias("n")).collect())


class TestPlanBatchesCLI:
    def test_accounting_json(self, spark, tmp_path, capsys):
        import json

        from dystonse_gtfs_importer_spark.cli import main

        docs = _docs(spark, [_word_doc(i, n) for i, n in
                             enumerate([9, 8, 5, 5, 2, 1])])
        path = str(tmp_path / "docs.parquet")
        docs.write.parquet(path)
        assert main(["-s", "x", "--dir", str(tmp_path), "corpus",
                     "plan-batches", "--docs", path,
                     "--max-tokens", "20", "--max-seqs", "3"],
                    spark=spark) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        # planted walk: 9,8 | 5,5,2 | 1 -> padded 18+15+1 = 34
        assert (out["n_batches"], out["n_rows"], out["real_tokens"],
                out["padded_cost"], out["longest_row"]) == \
            (3, 6, 30, 34, 9)
        assert out["waste_share"] == round(1 - 30 / 34, 4)


class TestLangIdConfusion:
    def test_planted_diagonal_and_miss(self, spark):
        """Stopword-bearing German/English text lands on the
        diagonal; a stopword-free doc labeled 'de' is an off-diagonal
        miss with its share accounted."""
        from dystonse_gtfs_importer_spark.functions import (
            sampling_sql as SAMP,
            sql_shared as S,
        )

        rows = [
            (0, "der hund und die katze ist nicht hier", "de", "s", 38),
            (1, "the cat and the dog is not here", "en", "s", 31),
            (2, "zzz yyy xxx www", "de", "s", 15),  # no signal
        ]
        _docs(spark, rows).createOrReplaceTempView("documents")
        got = {(r.actual, r.predicted): r for r in spark.sql(
            SAMP.q_lang_id_confusion(S.SPARK)).collect()}
        de_de = got[("de", "de")]
        assert (de_de.n, de_de.n_actual, de_de.cell_share,
                de_de.is_correct) == (1, 2, 0.5, 1)
        assert got[("en", "en")].is_correct == 1
        # the signal-free doc misses the diagonal
        (miss,) = [k for k in got if k[0] == "de" and k[1] != "de"]
        assert got[miss].cell_share == 0.5

    def test_fixture_profile_is_honest(self, spark, sf_smoke):
        """On the synthetic fixture the non-English text is random
        words, so the heuristic collapses to 'en' — the matrix must
        say so rather than flatter the filter."""
        from dystonse_gtfs_importer_spark.functions import (
            sampling_sql as SAMP,
            sql_shared as S,
        )
        from dystonse_gtfs_importer_spark.sources.testdata import (
            register_views,
        )

        register_views(spark, sf_smoke)
        rows = spark.sql(SAMP.q_lang_id_confusion(S.SPARK)).collect()
        correct = sum(r.n for r in rows if r.is_correct)
        total = sum(r.n for r in rows)
        en_total = sum(r.n for r in rows if r.actual == "en")
        assert correct == en_total  # only 'en' rows can be right here
        assert correct < total


class TestTokenizerFertilityOverflow:
    def test_extreme_ratio_stays_bigint(self, spark):
        """A single 3000-char one-token doc produces a chars/token
        ratio past 2^31 micro-units: the rate must come back as a
        BIGINT, not overflow or error."""
        from dystonse_gtfs_importer_spark.functions import (
            sampling_sql as SAMP,
            sql_shared as S,
        )

        rows = [(0, "x" * 3000, "xx", "s", 3000)]
        _docs(spark, rows).createOrReplaceTempView("documents")
        (r,) = spark.sql(SAMP.q_tokenizer_fertility(S.SPARK)).collect()
        assert r.chars_per_token_e6 == 3_000_000_000
        assert r.fertility_e6 == 1_000_000


class TestHtmlExtract:
    def test_planted_html_document(self, spark):
        from dystonse_gtfs_importer_spark.functions import pii_sql as PII
        from dystonse_gtfs_importer_spark.functions import sql_shared as S

        html = ('<html><HEAD><script src="x">var a = 1 < 2;</script>'
                '<style>.x{}</style></HEAD><body><h1>Title</h1>'
                '<p>Hello &amp; welcome to <a href="http://x">our '
                'site</a>.</p><P>Second &lt;para&gt;.</P></body></html>')
        rows = [(0, html, "en", "web", len(html)),
                (1, "plain text, no markup at all", "en", "txt", 28)]
        _docs(spark, rows).createOrReplaceTempView("documents")
        got = {r.doc_id: r for r in spark.sql(
            PII.q_html_extract(S.SPARK)).collect()}
        web, txt = got[0], got[1]
        assert (web.is_htmlish, web.n_links) == (1, 1)
        assert web.text_len < web.raw_len and web.text_ratio < 0.5
        # the extracted content itself, via the hash
        expected = ("Title Hello & welcome to our site . "
                    "Second <para>.")
        import hashlib
        assert web.extracted_hash == hashlib.md5(
            expected.encode()).hexdigest()
        # plain text passes through unchanged
        assert (txt.is_htmlish, txt.n_links, txt.text_ratio) == (0, 0, 1.0)
        assert txt.extracted_hash == hashlib.md5(
            b"plain text, no markup at all").hexdigest()


class TestLinkDomainHistogram:
    def test_planted_domains(self, spark):
        from dystonse_gtfs_importer_spark.functions import pii_sql as PII
        from dystonse_gtfs_importer_spark.functions import sql_shared as S

        rows = [
            (0, '<a href="http://a.com/x">x</a> '
                '<a HREF="https://b.org/y">y</a> '
                '<a href="http://A.com/z">z</a>', "en", "s", 90),
            (1, '<a href="http://a.com/other">w</a>', "en", "s", 34),
            (2, "no links here", "en", "s", 13),
        ]
        _docs(spark, rows).createOrReplaceTempView("documents")
        got = {r.domain: r for r in spark.sql(
            PII.q_link_domain_histogram(S.SPARK)).collect()}
        assert set(got) == {"a.com", "b.org"}
        a, b = got["a.com"], got["b.org"]
        # case-insensitive href, lowercased domain, per-doc distinct
        assert (a.n_links, a.n_docs, a.link_share) == (3, 2, 0.75)
        assert (b.n_links, b.n_docs, b.link_share) == (1, 1, 0.25)


class TestCharclassProfile:
    def test_planted_decomposition_sums_to_one(self, spark):
        from dystonse_gtfs_importer_spark.functions import (
            sampling_sql as SAMP,
            sql_shared as S,
        )

        rows = [(0, "café 42! ok", "fr", "s", 11),
                (1, "üüü", "de", "t", 3)]
        _docs(spark, rows).createOrReplaceTempView("documents")
        got = {r.source: r for r in spark.sql(
            SAMP.q_charclass_profile(S.SPARK)).collect()}
        s_ = got["s"]
        assert (s_.n_chars, s_.alpha_share, s_.digit_share,
                s_.space_share, s_.punct_share,
                s_.non_ascii_share) == (11, 0.4545, 0.1818, 0.1818,
                                        0.0909, 0.0909)
        t = got["t"]
        assert (t.non_ascii_share, t.alpha_share) == (1.0, 0.0)
        for r in got.values():
            total = (r.alpha_share + r.digit_share + r.space_share
                     + r.punct_share + r.non_ascii_share)
            assert abs(total - 1.0) < 0.001


class TestSourceReleaseGate:
    def test_every_reason_bit_fires(self, spark):
        """Four planted bad sources each trip exactly one gate; a
        clean source releases.  eval docs (doc_id % stride == 0) seed
        the contamination check."""
        from dystonse_gtfs_importer_spark.functions.decontam_sql import (
            EVAL_STRIDE,
        )
        from dystonse_gtfs_importer_spark.plans.oracle_queries import (
            q_source_release_gate,
        )
        from dystonse_gtfs_importer_spark.functions import sql_shared as S

        eval_text = " ".join(f"w{i}" for i in range(12))
        base = EVAL_STRIDE  # training ids start past the eval stride
        rows = [
            (0, eval_text, "en", "evalset", 50),
            # pii: the only doc has an email -> clean_share 0
            (base + 1, "mail bob@ex.com now", "en", "srcPii", 19),
            # contamination: shares the eval doc's leading 5-grams
            # but is NOT an exact copy (so only the contam bit fires)
            (base + 2, eval_text + " plus a distinct tail", "en",
             "srcContam", 71),
            # dedup: two of three docs are copies of a smaller-id text
            (base + 3, "dup text body", "en", "srcDup", 13),
            (base + 4, "dup text body", "en", "srcDup", 13),
            (base + 5, "dup text body", "en", "srcDup", 13),
            # charset: overwhelmingly non-ascii
            (base + 6, "ü" * 40, "de", "srcChars", 40),
            # clean
            (base + 7, "perfectly ordinary text here", "en",
             "srcGood", 28),
        ]
        _docs(spark, rows).createOrReplaceTempView("documents")
        got = {r.source: r for r in spark.sql(
            q_source_release_gate(S.SPARK)).collect()}
        assert got["srcPii"].reason_mask == 1
        assert got["srcContam"].reason_mask == 2
        assert got["srcDup"].reason_mask == 4
        assert got["srcChars"].reason_mask == 8
        assert (got["srcGood"].reason_mask, got["srcGood"].released) \
            == (0, 1)
        assert all(r.released == 0 for k, r in got.items()
                   if k not in ("srcGood", "evalset"))


class TestNnSimilarityHistogram:
    def test_planted_duplicate_mass_lands_at_one(self, spark):
        from dystonse_gtfs_importer_spark.functions import ann_sql as ANN
        from dystonse_gtfs_importer_spark.functions import sql_shared as S

        base = [float((i * 37) % 19) - 9.0 for i in range(64)]
        ortho = [0.0] * 64
        ortho[0] = 1.0
        # query 0 has an exact twin (top-1 cosine 1.0); query 50's
        # nearest is whatever the corpus offers below 1.0
        rows = [(0, base, 0), (1, base, 0), (50, ortho, 0),
                (2, [v + 5.0 for v in base], 0)]
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).createOrReplaceTempView("embeddings")
        got = {r.bucket_d1: r for r in spark.sql(
            ANN.q_nn_similarity_histogram(S.SPARK)).collect()}
        # the exact-twin query contributes the bucket at 1.0
        assert 10 in got and got[10].min_cos == 1.0
        assert sum(r.n_queries for r in got.values()) == 2


class TestLengthCalibration:
    def test_planted_percentiles(self, spark):
        from dystonse_gtfs_importer_spark.functions import (
            sampling_sql as SAMP,
            sql_shared as S,
        )

        rows = [(i, "x", "en", "srcA", n)
                for i, n in enumerate([10, 20, 30])] + \
               [(9, "y", "en", "srcB", 7)]
        _docs(spark, rows).createOrReplaceTempView("documents")
        got = {r.source: r for r in spark.sql(
            SAMP.q_length_calibration(S.SPARK)).collect()}
        a, b = got["srcA"], got["srcB"]
        assert (a.n_docs, a.p10_chars, a.p50_chars, a.p90_chars) == \
            (3, 10, 20, 30)
        assert (b.n_docs, b.p10_chars, b.p50_chars, b.p90_chars) == \
            (1, 7, 7, 7)
