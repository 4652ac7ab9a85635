"""Learned-BPE contracts: merge learning vs an independent reference,
encoder/trainer agreement, determinism, OOV handling, and the corpus
stats query's accounting."""

from __future__ import annotations

import pandas as pd
import pytest

from export_oltp_to_olap_spark.operators import bpe


# ---------------------------------------------------------------------------
# Independent reference implementation (textbook Sennrich Fig. 2, no code
# shared with the operator): merge the most frequent pair, ties broken
# (count desc, pair asc), until num_merges or no pair repeats.
# ---------------------------------------------------------------------------


def ref_learn(freqs: dict[str, int], num_merges: int) -> list[tuple[str, str]]:
    vocab = {tuple(list(w) + [bpe.END_OF_WORD]): c for w, c in freqs.items() if w}
    merges = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for seq, c in vocab.items():
            for pair in zip(seq, seq[1:]):
                counts[pair] = counts.get(pair, 0) + c
        live = {p: c for p, c in counts.items() if c >= 2}
        if not live:
            break
        pair = min(live, key=lambda p: (-live[p], p))
        merges.append(pair)
        new_vocab = {}
        for seq, c in vocab.items():
            out, i = [], 0
            while i < len(seq):
                if i + 1 < len(seq) and (seq[i], seq[i + 1]) == pair:
                    out.append(seq[i] + seq[i + 1])
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


SENNRICH = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_learn_merges_matches_reference_on_sennrich_corpus():
    got = bpe.learn_merges(list(SENNRICH.items()), 10)
    want = ref_learn(SENNRICH, 10)
    assert got == want
    # First merges hand-checked from the paper's worked example:
    # 'es' (9 = newest 6 + widest 3), then 'est', then 'est</w>'.
    assert got[:3] == [("e", "s"), ("es", "t"), ("est", bpe.END_OF_WORD)]


def test_learn_merges_tie_break_is_lexicographic():
    # "ab" and "cd" both appear twice; (a,b) < (c,d) lexicographically.
    merges = bpe.learn_merges([("ab", 2), ("cd", 2)], 1)
    assert merges == [("a", "b")]


def test_learn_stops_when_no_pair_repeats():
    merges = bpe.learn_merges([("abc", 1), ("xyz", 1)], 50)
    assert merges == []


def test_encoder_replays_trainer_segmentation():
    """Encoding a training word must reproduce the trainer's final
    symbol sequence for it (the greedy rank-order encoder is exactly
    the merge history replayed)."""
    freqs = list(SENNRICH.items())
    merges = bpe.learn_merges(freqs, 10)
    ranks = {p: i for i, p in enumerate(merges)}
    # Re-run the trainer's folding to get its final sequences.
    seqs = {w: list(w) + [bpe.END_OF_WORD] for w, _ in freqs}
    for left, right in merges:
        for seq in seqs.values():
            i = 0
            while i < len(seq) - 1:
                if seq[i] == left and seq[i + 1] == right:
                    seq[i : i + 2] = [seq[i] + seq[i + 1]]
                else:
                    i += 1
    for w in SENNRICH:
        assert bpe.segment_word(w, ranks) == seqs[w], w


def test_oov_word_segments_with_partial_merges():
    merges = bpe.learn_merges(list(SENNRICH.items()), 10)
    ranks = {p: i for i, p in enumerate(merges)}
    out = bpe.segment_word("lowest", ranks)  # unseen word, seen pieces
    assert "".join(out) == "lowest" + bpe.END_OF_WORD
    assert len(out) < len("lowest") + 1  # at least one merge applied


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    for i, (w, c) in enumerate(sorted(SENNRICH.items())):
        for j in range(c):
            rows.append((i * 100 + j, f"{w} {w}", "en", f"src{i % 2}", 11))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    )


def test_distributed_training_matches_driver_reference(docs):
    # Corpus word counts are 2× SENNRICH (each doc repeats its word
    # twice); scaling all counts preserves the merge sequence.
    merges = bpe.train_bpe(docs, num_merges=10)
    assert merges == ref_learn({w: 2 * c for w, c in SENNRICH.items()}, 10)


def test_training_deterministic_under_repartition(docs):
    a = bpe.train_bpe(docs, num_merges=10)
    b = bpe.train_bpe(docs.repartition(7), num_merges=10)
    assert a == b


def test_word_cap_restricts_training_table(docs):
    # Cap of 2 keeps only the two most frequent words (newest=12, low=10)
    merges = bpe.train_bpe(docs, num_merges=10, max_words=2)
    assert merges == ref_learn({"newest": 12, "low": 10}, 10)


def test_token_stats_accounting(docs, spark):
    stats = bpe.bpe_token_stats(docs, num_merges=10).toPandas()
    assert list(stats.columns) == [
        "source", "n_docs", "n_words", "n_subtokens", "n_merges_learned",
    ]
    assert stats["source"].tolist() == sorted(stats["source"].tolist())
    # Every word fully merges or not — subtokens per word ∈ [1, len+1];
    # totals must respect those bounds.
    total_words = int(stats["n_words"].sum())
    assert total_words == 2 * sum(SENNRICH.values())
    assert int(stats["n_subtokens"].sum()) >= total_words
    # Exact cross-check against driver-side segmentation:
    merges = bpe.train_bpe(docs, num_merges=10)
    ranks = {p: i for i, p in enumerate(merges)}
    want = sum(
        2 * c * len(bpe.segment_word(w, ranks)) for w, c in SENNRICH.items()
    )
    assert int(stats["n_subtokens"].sum()) == want


def test_token_stats_empty_corpus(spark):
    empty = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )
    stats = bpe.bpe_token_stats(empty, num_merges=5)
    assert stats.count() == 0
    assert stats.columns == [
        "source", "n_docs", "n_words", "n_subtokens", "n_merges_learned",
    ]
