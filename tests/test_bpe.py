"""BPE tokenizer (operators/bpe.py): hand-computed merge order and
tie-breaks (the independent truth pinning the q94 golden), apply
semantics, and Spark/driver agreement."""

from __future__ import annotations

import numpy as np

from air_health_gis_tools_spark.operators.bpe import (
    EOW, bpe_apply_word, bpe_token_stats, bpe_tokenize_np,
    bpe_train_merges)


def test_hand_computed_merges():
    # "aa" x2 + "ab": pair (a, a</w>) count 2 beats (a, b</w>) count 1
    merges = bpe_train_merges(["aa aa ab"], 2)
    assert merges[0] == ("a", "a" + EOW)
    assert merges[1] == ("a", "b" + EOW)


def test_tie_break_is_lexicographic():
    # (a,b</w>) and (c,d</w>) both count 2 -> lexicographically smallest
    merges = bpe_train_merges(["ab cd ab cd"], 1)
    assert merges[0] == ("a", "b" + EOW)


def test_apply_word_semantics():
    merges = bpe_train_merges(["aa aa ab"], 2)
    rank = {p: i for i, p in enumerate(merges)}
    assert bpe_apply_word("aa", rank) == ["aa" + EOW]
    assert bpe_apply_word("ab", rank) == ["ab" + EOW]
    # "aab": (a,a) has NO rank (the learned merge is (a, a</w>));
    # (a,b</w>) merges -> ['a', 'ab</w>']
    assert bpe_apply_word("aab", rank) == ["a", "ab" + EOW]
    # empty word is just the end marker
    assert bpe_apply_word("", rank) == [EOW]


def test_zero_merges_is_character_tokenization():
    n_tok, n_distinct = bpe_tokenize_np(np.array(["abc de"]), [])
    # a b c</w>  d e</w>
    assert n_tok[0] == 5
    assert n_distinct[0] == 5


def test_more_merges_never_increase_token_count():
    texts = ["the table value the value", "big table scan the big scan"]
    prev = None
    for n in (0, 2, 8, 32):
        merges = bpe_train_merges(texts, n)
        n_tok, _ = bpe_tokenize_np(np.array(texts), merges)
        total = int(n_tok.sum())
        if prev is not None:
            assert total <= prev
        prev = total
    assert len(bpe_train_merges(texts, 10_000)) < 10_000  # saturates


def test_spark_apply_matches_driver(spark):
    texts = ["key agg row scan", "table value part hash value",
             "a row fast merge batch", "key agg row scan"]
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe_train_merges(texts, 16)
    got = (bpe_token_stats(df, merges)
           .select("doc_id", "_bpe.n_bpe_tokens", "_bpe.n_bpe_distinct")
           .toPandas().sort_values("doc_id").reset_index(drop=True))
    n_tok, n_dist = bpe_tokenize_np(np.array(texts), merges)
    assert (got["n_bpe_tokens"].to_numpy() == n_tok).all()
    assert (got["n_bpe_distinct"].to_numpy() == n_dist).all()


def test_training_deterministic():
    texts = ["key agg row scan slow fast", "table value part hash"]
    assert bpe_train_merges(texts, 24) == bpe_train_merges(texts, 24)
