"""training_prep internals: the BPE encoder loop's rank-priority and
overlap semantics (the corpus-wide behavior is pinned by the DuckDB
oracle; these pin the per-word loop against handcrafted merge tables,
including shapes the synthetic corpus may never produce)."""

from __future__ import annotations

from autonomus_datapipeline_spark.workloads.training_prep import _bpe_apply


def test_rank_priority_beats_position():
    # 'abc': ab(rank0) claims b before bc(rank1) can — GPT-2 semantics,
    # NOT leftmost-pair-wins-regardless-of-rank
    assert _bpe_apply("abc", [("a", "b"), ("b", "c")]) == ["ab", "c"]
    # flipped ranks: bc wins, ab can no longer form
    assert _bpe_apply("abc", [("b", "c"), ("a", "b")]) == ["a", "bc"]


def test_overlapping_occurrences_merge_left_to_right():
    # 'aaaa' with (a,a): leftmost-first, non-overlapping → (aa)(aa)
    assert _bpe_apply("aaaa", [("a", "a")]) == ["aa", "aa"]
    # odd run: (aa)(aa)a
    assert _bpe_apply("aaaaa", [("a", "a")]) == ["aa", "aa", "a"]


def test_cascaded_multichar_table_entries():
    # rank-general: a second-level entry over a merged symbol applies
    merges = [("l", "l"), ("ll", "o"), ("h", "e")]
    assert _bpe_apply("hello", merges) == ["he", "llo"]


def test_degenerate_words():
    assert _bpe_apply("x", [("a", "b")]) == ["x"]
    assert _bpe_apply("xy", []) == ["x", "y"]


def test_merge_at_word_edges():
    assert _bpe_apply("ab", [("a", "b")]) == ["ab"]
    assert _bpe_apply("zab", [("a", "b")]) == ["z", "ab"]
    assert _bpe_apply("abz", [("a", "b")]) == ["ab", "z"]


def test_bpe_apply_matches_reference_on_random_inputs():
    """Property check: _bpe_apply agrees with an independently written
    (rank, position)-argmin reference on random words and merge tables,
    and always reconstructs the word when concatenated."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    def reference(w, merges):
        rank = {p: i for i, p in enumerate(merges)}
        syms = list(w)
        while True:
            cands = [
                (rank[(syms[j], syms[j + 1])], j)
                for j in range(len(syms) - 1)
                if (syms[j], syms[j + 1]) in rank
            ]
            if not cands:
                return syms
            _, j = min(cands)
            syms = syms[:j] + [syms[j] + syms[j + 1]] + syms[j + 2:]

    alphabet = "abc"
    words = st.text(alphabet=alphabet, min_size=0, max_size=12)
    pair = st.tuples(
        st.text(alphabet=alphabet, min_size=1, max_size=2),
        st.text(alphabet=alphabet, min_size=1, max_size=2),
    )
    tables = st.lists(pair, min_size=0, max_size=6, unique=True)

    @settings(max_examples=300, deadline=None)
    @given(words, tables)
    def check(w, merges):
        got = _bpe_apply(w, merges)
        assert got == reference(w, merges)
        assert "".join(got) == w

    check()
