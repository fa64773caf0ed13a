"""Distributed BPE training parity: the Spark merge sequence must
equal a single-process reference implementation (same tie-break),
and the encoder must reproduce classic BPE segmentations."""

from __future__ import annotations

from collections import Counter


def reference_bpe(word_counts: dict[str, int],
                  n_merges: int) -> list[tuple[str, str]]:
    """Textbook in-memory BPE (Sennrich alg. 1) with the same
    deterministic tie-break as operators/bpe.py: count DESC, pair ASC."""
    from dystonse_gtfs_importer_spark.operators.bpe import END_MARK

    vocab = {tuple(list(w) + [END_MARK]): c
             for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for seq, c in vocab.items():
            for i in range(len(seq) - 1):
                pairs[(seq[i], seq[i + 1])] += c
        if not pairs:
            break
        (a, b), _ = min(pairs.items(),
                        key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((a, b))
        new_vocab = {}
        for seq, c in vocab.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


CORPUS = [
    "low low low low low",
    "lower lower newest newest newest",
    "newest newest newest widest widest",
    "low lower newest widest wider",
]


class TestBpeTrain:
    def test_merge_sequence_matches_reference(self, spark):
        from dystonse_gtfs_importer_spark.operators.bpe import bpe_train

        docs = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)],
                                     "doc_id LONG, text STRING")
        got = bpe_train(docs, n_merges=12)

        wc: Counter = Counter()
        for t in CORPUS:
            wc.update(t.split())
        ref = reference_bpe(dict(wc), 12)
        assert got == ref
        # sanity: the classic 'est</w>' family of merges appears
        assert ("es", "t</w>") in got or ("e", "s") in got

    def test_token_counts_and_encoding(self, spark):
        from dystonse_gtfs_importer_spark.operators.bpe import (
            END_MARK, bpe_token_counts, bpe_train,
        )

        docs = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)],
                                     "doc_id LONG, text STRING")
        merges = bpe_train(docs, n_merges=12)
        counts = {r.token: r.cnt
                  for r in bpe_token_counts(docs, merges).collect()}
        # total symbol mass conserved: sum over tokens of
        # count*len(chars) equals the raw character mass + end marks
        total_chars = sum(len(w) for t in CORPUS for w in t.split())
        n_words = sum(len(t.split()) for t in CORPUS)
        mass = sum(c * len(tok.replace(END_MARK, ""))
                   for tok, c in counts.items())
        end_mass = sum(c for tok, c in counts.items()
                       if tok.endswith(END_MARK))
        assert mass == total_chars
        assert end_mass == n_words

    def test_early_stop_on_exhausted_pairs(self, spark):
        from dystonse_gtfs_importer_spark.operators.bpe import bpe_train

        docs = spark.createDataFrame([(1, "a a a")],
                                     "doc_id LONG, text STRING")
        # 'a</w>' fully merges after one step; asking for 10 stops early
        merges = bpe_train(docs, n_merges=10)
        assert merges == [("a", "</w>")]

    def test_jvm_merge_fold_matches_indexed_while_loop(self, spark):
        """r13: _apply_merge runs as a JVM aggregate fold.  Pin its
        equivalence to the indexed while-loop semantics (in 'aaa'
        with merge (a,a) the LEFT pair merges; a freshly merged token
        is never re-merged as a left element) on the adversarial
        shapes: runs of the merge pair, overlapping occurrences, and
        pairs whose concatenation collides with a neighbouring
        token."""
        from dystonse_gtfs_importer_spark.operators.bpe import _apply_merge

        def while_loop(seq, a, b):
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            return out

        cases = [
            (["a", "a", "a"], "a", "a"),
            (["a", "a", "a", "a"], "a", "a"),
            (["a", "b", "a", "b"], "a", "b"),
            (["a", "a", "b"], "a", "b"),
            (["b", "a", "b", "b"], "a", "b"),
            (["ab", "a", "b", "ab"], "a", "b"),      # merged == neighbour
            (["a", "ab", "b"], "a", "ab"),           # b == a+b prefix play
            (["x"], "a", "b"),
            ([], "a", "b"),
            (["a", "b", "b", "a", "b"], "b", "b"),
        ]
        for seq, a, b in cases:
            df = spark.createDataFrame(
                [(1, seq)], "cnt LONG, syms ARRAY<STRING>")
            got = _apply_merge(df, a, b).collect()[0]["syms"]
            assert got == while_loop(seq, a, b), (seq, a, b, got)
