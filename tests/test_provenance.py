"""D19/D20 provenance: fuzzy ratio, DAG refinement, and the search queries."""

import math

from docprompt_spark import kernels


def W(text, x0, top, x1=None, bottom=None):
    return {
        "text": text,
        "x0": x0,
        "top": top,
        "x1": x1 if x1 is not None else x0 + 0.02,
        "bottom": bottom if bottom is not None else top + 0.01,
    }


def test_fuzz_ratio_definition():
    assert kernels.fuzz_ratio("abcd", "abcd") == 100.0
    # LCS("abcd","abce")=3 -> 2*3/8 = 75
    assert math.isclose(kernels.fuzz_ratio("abcd", "abce"), 75.0)
    assert kernels.fuzz_ratio("", "") == 100.0
    assert kernels.fuzz_ratio("a", "") == 0.0


def test_default_process():
    assert kernels.default_process("  Hello, World! ") == "hello world"
    assert kernels.default_process("qunq;") == "qunq"


def test_refine_single_token():
    words = [W("alpha", 0.1, 0.1), W("beta", 0.2, 0.1)]
    merged, matched = kernels.refine_query_to_word_level(words, "beta")
    assert merged["text"] == "beta" and len(matched) == 1


def test_refine_multiword_prefers_adjacent_path():
    # 'beta' appears twice; squared-jump weights must pick the adjacent one
    words = [
        W("alpha", 0.10, 0.1),
        W("beta", 0.20, 0.1),
        W("gamma", 0.30, 0.1),
        W("beta", 0.10, 0.2),
    ]
    merged, matched = kernels.refine_query_to_word_level(words, "alpha beta gamma")
    assert [w["text"] for w in matched] == ["alpha", "beta", "gamma"]
    assert merged["text"] == "alpha beta gamma "
    assert merged["x0"] == 0.10 and merged["x1"] == 0.32


def test_refine_fuzzy_tolerates_typo():
    words = [W("extraction", 0.1, 0.1), W("pipeline", 0.25, 0.1)]
    hit = kernels.refine_query_to_word_level(words, "extractoin pipeline")
    assert hit is not None
    assert [w["text"] for w in hit[1]] == ["extraction", "pipeline"]


def test_refine_no_match_returns_none():
    words = [W("alpha", 0.1, 0.1)]
    assert kernels.refine_query_to_word_level(words, "zzz qqq") is None


def test_provenance_refined_search_query(spark):
    from docprompt_spark import queries as q

    df = q.registry()["provenance_refined_search"][0](spark, "unused")
    rows = df.collect()
    assert rows
    for r in rows:
        # the query tokens were taken verbatim from the doc -> exact match
        assert r["n_words"] >= 2
        got = [kernels.default_process(t) for t in r["matched_text"].split()]
        want = [kernels.default_process(t) for t in r["query"].split()]
        assert got == want
