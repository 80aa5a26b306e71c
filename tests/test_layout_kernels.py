"""Unit tests for the layout kernels against the reference semantics
(file:line cites refer to /root/reference/docprompt)."""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from docprompt_spark import kernels


def W(text, x0, top, x1, bottom):
    return {"text": text, "x0": x0, "top": top, "x1": x1, "bottom": bottom}


# --- bbox algebra (schema/layout.py:64-188) --------------------------------


def test_intersection_empty_returns_none():
    assert kernels.bbox_intersection((0, 0, 0.1, 0.1), (0.5, 0.5, 0.6, 0.6)) is None


def test_intersection_touching_edge_is_degenerate_not_none():
    # reference uses <= so a shared edge yields a zero-area box, not None
    r = kernels.bbox_intersection((0, 0, 0.5, 0.5), (0.5, 0, 1.0, 0.5))
    assert r == (0.5, 0, 0.5, 0.5)


def test_union_and_combine():
    a, b, c = (0.1, 0.1, 0.2, 0.2), (0.05, 0.15, 0.15, 0.3), (0.5, 0.0, 0.6, 0.05)
    assert kernels.bbox_union(a, b) == (0.05, 0.1, 0.2, 0.3)
    assert kernels.bbox_combine([a, b, c]) == (0.05, 0.0, 0.6, 0.3)


def test_contains_is_non_strict():
    # layout.py:91-97 uses <=/>= — a box contains itself
    a = (0.1, 0.1, 0.2, 0.2)
    assert kernels.bbox_contains(a, a)


def test_iou():
    a, b = (0.0, 0.0, 0.2, 0.2), (0.1, 0.1, 0.3, 0.3)
    inter = 0.1 * 0.1
    union = 0.04 + 0.04 - inter
    assert math.isclose(kernels.bbox_iou(a, b), inter / union)
    assert kernels.bbox_iou(a, (0.9, 0.9, 1.0, 1.0)) == 0.0


def test_xy_overlap_absolute_lengths_not_ratios():
    # layout.py:113-123 returns absolute lengths despite docstring
    a, b = (0.0, 0.0, 0.2, 0.2), (0.1, 0.15, 0.5, 0.5)
    assert math.isclose(kernels.bbox_x_overlap(a, b), 0.1)
    assert math.isclose(kernels.bbox_y_overlap(a, b), 0.05)


# --- line clustering (utils/layout.py:113-165) ------------------------------


def test_cluster_words_same_baseline_one_line():
    words = [W("b", 0.3, 0.1, 0.35, 0.12), W("a", 0.1, 0.1, 0.15, 0.12)]
    lines = kernels.cluster_words_into_lines(words)
    assert [[w["text"] for w in ln] for ln in lines] == [["a", "b"]]


def test_cluster_words_breaks_on_low_overlap():
    words = [
        W("a", 0.1, 0.10, 0.15, 0.12),
        W("b", 0.3, 0.10, 0.35, 0.12),
        W("c", 0.1, 0.13, 0.15, 0.15),  # no vertical overlap with b
    ]
    lines = kernels.cluster_words_into_lines(words)
    assert [[w["text"] for w in ln] for ln in lines] == [["a", "b"], ["c"]]


def test_cluster_greedy_compares_with_last_word_only():
    # word with half-step offset chains lines together (greedy semantics)
    words = [
        W("a", 0.1, 0.100, 0.15, 0.120),
        W("b", 0.3, 0.110, 0.35, 0.130),  # overlap 0.01 / total 0.03 < 0.5 → break
    ]
    lines = kernels.cluster_words_into_lines(words)
    assert len(lines) == 2


# --- margin regularization (utils/layout.py:9-64) ---------------------------


def test_normalize_block_edges_min_cluster_size():
    words = [W(str(i), 0.1 + i * 0.0001, 0.1, 0.2, 0.12) for i in range(4)]
    out = kernels.normalize_block_edges(words)
    avg = sum(w["x0"] for w in words) / 4
    assert all(w["x0"] == avg for w in out)
    # clusters smaller than 4 stay untouched
    small = [W(str(i), 0.1 + i * 0.0001, 0.1, 0.2, 0.12) for i in range(3)]
    assert [w["x0"] for w in kernels.normalize_block_edges(small)] == [
        w["x0"] for w in small
    ]


# --- line construction (utils/layout.py:191-224) -----------------------------


def test_construct_word_line_spacing_arithmetic():
    # x_density=0.01; word at x0=0.05 with shift 0.0 → round(5)=5 leading spaces
    words = [W("ab", 0.05, 0.1, 0.07, 0.12), W("cd", 0.12, 0.1, 0.14, 0.12)]
    line, starts = kernels.construct_word_line(words, x_density=0.01, x_shift=0.0)
    assert line == "     ab" + " " * (12 - 7) + "cd"
    assert starts == [5, 12]
    # second word earlier than current length → no negative spaces
    words2 = [W("abcdefgh", 0.0, 0.1, 0.08, 0.12), W("x", 0.02, 0.1, 0.03, 0.12)]
    line2, starts2 = kernels.construct_word_line(words2, x_density=0.01, x_shift=0.0)
    assert line2 == "abcdefghx"
    assert starts2 == [0, 8]


def test_page_layout_newline_counts_clamped_1_to_4():
    # two lines very far apart → 4 newlines max (utils/layout.py:303)
    words = [
        W("a", 0.1, 0.05, 0.15, 0.07),
        W("b", 0.1, 0.90, 0.15, 0.92),
    ]
    layout = kernels.build_page_layout(words)
    assert layout["page_text"].count("\n") == 4
    assert len(layout["blocks"]) == 2  # far apart → separate derived blocks


def test_assemble_doc_spans_offsets_cumulative():
    pr = [
        {"page_number": 2, "page_text": "xyz", "spans": [
            {"kind": "word", "text": "xyz", "media_ref": None, "offset": 0}]},
        {"page_number": 1, "page_text": "ab", "spans": [
            {"kind": "word", "text": "ab", "media_ref": None, "offset": 0}]},
    ]
    out = kernels.assemble_doc_spans(pr)
    assert [s["offset"] for s in out] == [0, 3]  # "ab" + \f separator


# --- property-based invariants ----------------------------------------------

coord = st.floats(min_value=0, max_value=0.98, allow_nan=False)


@st.composite
def word_boxes(draw):
    x0 = draw(coord)
    top = draw(coord)
    return W(
        draw(st.text(min_size=1, max_size=6, alphabet="abcxyz")),
        x0,
        top,
        x0 + draw(st.floats(min_value=0.001, max_value=0.02)),
        top + draw(st.floats(min_value=0.001, max_value=0.02)),
    )


@settings(max_examples=60, deadline=None)
@given(st.lists(word_boxes(), min_size=1, max_size=40))
def test_clustering_partitions_all_words(words):
    lines = kernels.cluster_words_into_lines(words)
    flat = [w["text"] for ln in lines for w in ln]
    assert sorted(flat) == sorted(w["text"] for w in words)
    for ln in lines:
        assert all(ln[i]["x0"] <= ln[i + 1]["x0"] for i in range(len(ln) - 1))


@settings(max_examples=60, deadline=None)
@given(st.lists(word_boxes(), min_size=1, max_size=40))
def test_page_layout_word_offsets_point_at_text(words):
    layout = kernels.build_page_layout(words)
    text = layout["page_text"]
    for ln in layout["lines"]:
        for w in ln["words"]:
            assert text[w["start"] : w["start"] + len(w["text"])] == w["text"]
