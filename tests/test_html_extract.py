"""HTML main-content extraction (html_extract.py) unit tests."""

from docprompt_spark.html_extract import (
    boilerplate_stats,
    classify_blocks,
    extract_main_content,
    segment_blocks,
)

PAGE = """
<!DOCTYPE html><html><head><title>t</title>
<style>p {color: red}</style><script>if (a < b) { x("<p>"); }</script></head>
<body>
<nav><ul><li><a href="/">Home</a></li><li><a href="/a">About</a></li></ul></nav>
<div class="sidebar"><a href="/t/x">x</a> <a href="/t/y">y</a></div>
<article>
<h1>The Headline Goes Here</h1>
<p>This is the first long paragraph of the article body and it clearly has
well over sixteen words to satisfy the classifier threshold today.</p>
<p>Short middle note.</p>
<p>And a second long paragraph which also contains comfortably more than
sixteen words so the boilerpipe rule keeps it as main content text.</p>
<img src="/img/fig1.png" alt="f">
</article>
<div class="more"><a href="/1">one two three</a> <a href="/2">four five six</a>
<a href="/3">seven eight nine</a> <a href="/4">ten eleven twelve</a></div>
<footer><p>&copy; 2024 example</p></footer>
</body></html>
"""


def test_boilerplate_is_stripped():
    spans = extract_main_content(PAGE)
    texts = [s["text"] for s in spans if s["text"]]
    joined = " ".join(texts)
    assert "Home" not in joined and "About" not in joined  # nav
    assert "2024 example" not in joined  # footer
    assert "one two three" not in joined  # link-dense div (ld rule)
    assert "color" not in joined  # style
    assert "not content" not in joined and "x(" not in joined  # script


def test_main_content_order_and_offsets():
    spans = extract_main_content(PAGE)
    kinds = [s["kind"] for s in spans]
    assert kinds == ["heading", "block", "block", "block", "media"]
    assert spans[0]["text"] == "The Headline Goes Here"
    assert spans[1]["text"].startswith("This is the first long paragraph")
    assert spans[2]["text"] == "Short middle note."  # neighbor rule keeps it
    # offsets: contiguous newline-joined
    assert spans[0]["offset"] == 0
    assert spans[1]["offset"] == len(spans[0]["text"]) + 1
    # media offset = end of preceding kept text
    assert spans[4]["offset"] == spans[3]["offset"] + len(spans[3]["text"])
    assert spans[4]["media_ref"] is not None


def test_entity_decode_and_inline_markup():
    page = (
        "<body><p>alpha &amp; beta <b>bold</b> tail with several additional filler "
        "words present in this single paragraph so that the word count threshold "
        "is satisfied today</p></body>"
    )
    spans = extract_main_content(page)
    assert len(spans) == 1
    assert "alpha & beta bold tail" in spans[0]["text"]


def test_link_density_rule():
    long_prose = " ".join(f"word{i}" for i in range(45))
    blocks = segment_blocks(
        '<body><div><a href="/x">all of this text is one giant link body</a></div>'
        f"<div>{long_prose}</div></body>"
    )
    verdicts = classify_blocks(blocks)
    # boilerpipe: after a link-dense block (prev_ld > 0.556) the bar is
    # curr > 40 words — the 45-word prose clears it, the link block never does
    assert verdicts == [False, True]


def test_stats_shape():
    st = boilerplate_stats(PAGE)
    assert st["n_content_blocks"] == 5  # h1 + 3 paragraphs + img block
    assert st["n_media"] == 1
    assert st["content_words"] > 40
    assert st["n_boilerplate_blocks"] >= 1


def test_corpus_generation_asserts_extractor_parity():
    """gen_html_doc itself asserts extractor == structural golden; touching
    many seeds here keeps the invariant covered."""
    from docprompt_spark.html_corpus import gen_html_corpus

    for seed in (42, 7, 99):
        docs = gen_html_corpus(25, seed=seed)
        assert len(docs) == 25
        assert all(d["spans"][0]["kind"] == "heading" for d in docs)


def test_misnested_and_unclosed_tags_tolerated():
    page = (
        "<body><p>first long paragraph with definitely more than sixteen words in "
        "it to pass the classifier threshold <b>bold spilling over</p>"
        "<p>second</b> paragraph which is also comfortably long enough with many "
        "more than sixteen words present in total for the classifier rule</p>"
    )
    spans = extract_main_content(page)
    assert len(spans) == 2


def test_unclosed_anchor_does_not_poison_later_blocks():
    """An <a> never closed before its block ends must not inflate
    link_density for every later block (ADVICE r2: link_depth leak).
    The div close unwinds the dangling <a>; the following paragraphs
    contain no links at all and must classify as content."""
    page = (
        '<body><div><a href="/x">dangling link text'  # no </a>
        "</div>"
        "<p>first long paragraph with definitely more than sixteen words in it "
        "to pass the numwords classifier threshold for main content today</p>"
        "<p>second paragraph also comfortably long enough with many more than "
        "sixteen words present in total for the boilerpipe decision rule</p>"
    )
    blocks = segment_blocks(page)
    paras = [b for b in blocks if b.text.startswith(("first", "second"))]
    assert len(paras) == 2
    assert all(b.link_chars == 0 for b in paras)
    spans = extract_main_content(page)
    assert [s["text"][:6] for s in spans] == ["first ", "second"]
