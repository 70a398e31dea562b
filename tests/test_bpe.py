"""sparklog.bpe — the subword tokenizer under the token-keyed ops.

The cross-ENGINE guarantees (Spark result == DuckDB oracle) live in the
op-level parity tests; here we pin the cross-IMPLEMENTATION guarantees
the oracle construction relies on: the Python per-rule fold equals the
DuckDB recursive list_reduce fold for arbitrary words and merge tables,
tokenization preserves the normalized character stream, and learning is
deterministic.
"""

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from sparklog.bpe import (apply_merges, extract_words, learn_bpe,
                          merge_pair_once, tokenize_text)

_word = st.text(alphabet="abcdz", min_size=1, max_size=12)


def _duck_apply(words, merges):
    """Tokenize ``words`` through the PRODUCTION oracle fold — the exact
    CTE block queries._sql_bpe_apply_ctes generates for the gate SQL —
    so this differential pins the generator itself, not a re-statement
    of it."""
    from sparklog.queries import _sql_bpe_apply_ctes

    wl = ", ".join(f"('{w}')" for w in words)
    sql = (f"WITH RECURSIVE bpe_wl(w) AS (VALUES {wl}),\n"
           f"{_sql_bpe_apply_ctes(merges)}\n"
           f"SELECT w, toks FROM bpe_rec WHERE mi = {len(merges)}")
    return dict(duckdb.connect().execute(sql).fetchall())


def test_merge_pair_once_left_to_right_nonoverlapping():
    assert merge_pair_once(tuple("aaaa"), "a", "a") == ("aa", "aa")
    assert merge_pair_once(tuple("aaa"), "a", "a") == ("aa", "a")
    assert merge_pair_once(("ab", "b", "b"), "ab", "b") == ("abb", "b")
    assert merge_pair_once(("x", "a", "b", "a", "b"), "a", "b") == \
        ("x", "ab", "ab")


def test_learner_is_deterministic_and_order_insensitive():
    wf = [("table", 10), ("tablet", 5), ("battle", 7), ("le", 2)]
    m1 = learn_bpe(wf, 16)
    m2 = learn_bpe(list(reversed(wf)), 16)
    assert m1 == m2 and m1
    # a count-1 pair never merges: a unique word's word-specific pairs
    # stay unmerged once shared pairs are exhausted
    assert all(a and b for a, b in m1)


@settings(max_examples=25, deadline=None)
@given(st.lists(_word, min_size=1, max_size=30),
       st.lists(_word, min_size=0, max_size=12))
def test_python_fold_equals_duckdb_fold(corpus, probes):
    """For a merge table learned from random words, the Python
    application and the oracle's recursive list_reduce fold agree on
    every corpus word AND every probe (including OOV) word."""
    from collections import Counter

    wf = Counter(corpus)
    merges = learn_bpe(
        sorted(wf.items(), key=lambda kv: (-kv[1], kv[0])), 24)
    words = sorted(set(corpus) | set(probes))
    got = _duck_apply(words, merges)
    for w in words:
        assert apply_merges(w, merges) == got[w], (w, merges)


@settings(max_examples=50, deadline=None)
@given(st.text(max_size=200))
def test_tokenization_preserves_normalized_stream(text):
    """concat(tokens) == concat(normalized words) for ANY input — merges
    reorder boundaries, never characters."""
    merges = learn_bpe([("abcd", 5), ("abce", 3), ("zd", 2)], 8)
    assert "".join(tokenize_text(text, merges, {})) == \
        "".join(extract_words(text))


def test_extract_words_ascii_only_lowering():
    assert extract_words("The QUICK-brown fox2dog") == \
        ["the", "quick", "brown", "fox", "dog"]
    assert extract_words("") == []
    assert extract_words(None or "") == []
    # non-ASCII letters are word BOUNDARIES, never lowered into [a-z]
    assert extract_words("naïve Ärger") == ["na", "ve", "rger"]


def test_empty_merge_table_degenerate_corpus(spark, tmp_path):
    """A corpus of single-letter words learns ZERO merges (no adjacent
    pair exists inside any word) — the ops and the oracle must agree on
    the merge-free path: every token is a single character, and the
    recursive CTE (whose VALUES dim gets a dummy row with recursion
    bound 0) never fires."""
    import duckdb
    import pandas as pd

    from sparklog.queries import (SQL_TOKEN_VOCAB_TOPK, _bpe_merges,
                                  _bpe_oracle_merges, token_vocab_topk)

    rows = [(0, "a b c a", "en", "web"), (1, "b c", "en", "web"),
            (2, "", "en", "web")]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    pdf["n_chars"] = pdf["text"].str.len().astype("int32")
    d = str(tmp_path)
    spark.createDataFrame(pdf).coalesce(1).write.parquet(
        f"{d}/documents.parquet")

    assert _bpe_merges(spark, d) == []
    assert _bpe_oracle_merges(d) == []
    got = {r.token: (r.n_occurrences, r.n_docs)
           for r in token_vocab_topk(spark, d).collect()}
    assert got == {"a": (2, 1), "b": (2, 2), "c": (2, 2)}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet/*.parquet')")
    odf = con.execute(SQL_TOKEN_VOCAB_TOPK(d)).df()
    assert {r.token: (int(r.n_occurrences), int(r.n_docs))
            for _, r in odf.iterrows()} == got
