"""Gates for the BPE trainer (``train_bpe_merges``, Sennrich 2016)
and the trained-table tokenizer drop-in.

The trainer's incremental pair-count maintenance is the part that can
silently rot (stale index entries, missed decrements), so the primary
gate is equivalence against a NAIVE full-recount reference
implementation — independent code, same deterministic tie rule — over
corpora engineered to stress overlap (repeated letters, shared
prefixes) plus seeded random ones.
"""

from __future__ import annotations

import pytest
import random
from collections import Counter

from go_otel_clickhouse_ingestor_spark.operators.text import (
    _BPE_RANKS,
    bpe_encode_with,
    train_bpe_merges,
)


def _apply(seq: list, best: tuple) -> list:
    out, j = [], 0
    while j < len(seq):
        if j < len(seq) - 1 and (seq[j], seq[j + 1]) == best:
            out.append(seq[j] + seq[j + 1])
            j += 2
        else:
            out.append(seq[j])
            j += 1
    return out


def _naive_train(word_counts, n_merges):
    """Full pair-recount per merge — the O(n_merges · corpus) reference."""
    seqs = [list(w) for w, _ in word_counts]
    counts = [c for _, c in word_counts]
    merges = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for seq, c in zip(seqs, counts):
            for p in zip(seq, seq[1:]):
                pc[p] += c
        if not pc:
            break
        top = max(pc.values())
        best = min(p for p, c in pc.items() if c == top)
        merges.append(best)
        seqs = [_apply(s, best) for s in seqs]
    return merges


def test_canonical_corpus_first_merges():
    """The classic subword-NMT example: ('e','s') then ('es','t')."""
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_bpe_merges(wc, 10)
    assert merges[:2] == [("e", "s"), ("es", "t")]


def test_incremental_matches_naive_reference():
    corpora = [
        [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)],
        [("aaaa", 4), ("aaab", 3), ("abab", 2), ("bbbb", 1)],  # overlap stress
        [("mississippi", 3), ("missive", 2), ("pippin", 5)],
    ]
    for seed in range(5):
        rng = random.Random(seed)
        corpora.append(
            [
                (
                    "".join(rng.choice("abcdef") for _ in range(rng.randint(2, 9))),
                    rng.randint(1, 20),
                )
                for _ in range(60)
            ]
        )
    for wc in corpora:
        # dedup words (duplicate keys would double-index in the trainer)
        agg: Counter = Counter()
        for w, c in wc:
            agg[w] += c
        wc = sorted(agg.items())
        assert train_bpe_merges(wc, 40) == _naive_train(wc, 40), wc[:5]


def test_trainer_deterministic():
    wc = [("banana", 7), ("bandana", 3), ("cabana", 5)]
    assert train_bpe_merges(wc, 25) == train_bpe_merges(wc, 25)


def test_encode_with_trained_table_reaches_whole_words():
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    ranks = {p: i for i, p in enumerate(train_bpe_merges(wc, 100))}
    # enough merges -> every training word collapses to one token
    for w, _ in wc:
        assert bpe_encode_with(w, ranks) == [w]
    # an unseen word still splits by the learned subwords, never crashes
    assert len(bpe_encode_with("lowest", ranks)) >= 1


@pytest.mark.slow  # corpus-wide train+encode quality gate (~14 s with setup): full tier
def test_trained_table_beats_frozen_on_its_corpus(spark, sf_dir):
    """The trained tokenizer must compress the corpus it learned at
    least as well as the frozen English table, with every per-row
    bound (ws <= bpe <= chars) intact."""
    from go_otel_clickhouse_ingestor_spark.registry import load_all

    reg = load_all()
    trained = reg["text_bpe_tokenize_trained"].fn(spark, sf_dir).toPandas()
    frozen = reg["text_bpe_tokenize"].fn(spark, sf_dir).toPandas()
    assert trained.n_tokens_bpe.sum() <= frozen.n_tokens_bpe.sum()
    assert (trained.n_tokens_ws <= trained.n_tokens_bpe).all()
    assert len(trained) == len(frozen) > 0


def test_train_query_shape_and_determinism(spark, sf_dir):
    from go_otel_clickhouse_ingestor_spark.registry import load_all

    reg = load_all()
    a = reg["text_bpe_train"].fn(spark, sf_dir).collect()
    b = reg["text_bpe_train"].fn(spark, sf_dir).collect()
    assert a == b and len(a) > 10
    assert [f.simpleString() for f in reg["text_bpe_train"].fn(spark, sf_dir).schema.fields] == [
        "rank:bigint", "left:string", "right:string", "merged:string",
    ]
    # ranks are dense 0..n-1 and merged = left+right
    assert [r.rank for r in a] == list(range(len(a)))
    assert all(r.merged == r.left + r.right for r in a)
    # frozen-table sanity: the refactored encode path still honors it
    assert len(_BPE_RANKS) == 40
