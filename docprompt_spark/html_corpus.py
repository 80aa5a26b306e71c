"""Deterministic synthetic HTML corpus: boilerplate-wrapped articles.

Each document is a full HTML page with realistic boilerplate around one
article:

* ``<head>`` with title/style/script, ``<nav>`` menu, ``<header>`` site
  banner, link-list sidebar (``class="sidebar"``), a link-dense "related
  posts" div (dropped by the link-density rule, not by tag pruning),
  a ``class="comments"`` section, ``<footer>``,
* ``<article>`` with an ``<h1>`` headline, long paragraphs (18-40 words),
  optionally one SHORT paragraph mid-article (kept by the boilerpipe
  neighbor rule — exercises the non-trivial branch), inline ``<img>``
  figures, entities (&amp;...) and inline markup (<b>/<em>/<a>).

The golden span sequence is derived STRUCTURALLY from the generated article
(headline, paragraph texts, image srcs — not by running the extractor);
``gen_html_doc`` then ASSERTS the extractor reproduces it exactly, so any
divergence fails loudly at generation time instead of silently shipping a
circular golden.
"""

from __future__ import annotations

import hashlib
import random
from typing import List, Tuple

from docprompt_spark.corpus import _vocab
from docprompt_spark.html_extract import extract_main_content

_SITES = ["example", "news", "blog", "daily", "journal"]


def _words(rng: random.Random, vocab: List[str], n: int) -> List[str]:
    return [rng.choice(vocab) for _ in range(n)]


def _sentence(rng: random.Random, vocab: List[str], n: int) -> str:
    ws = _words(rng, vocab, n)
    return " ".join(ws)


def _nav(rng: random.Random, vocab) -> str:
    items = "".join(
        f'<li><a href="/{w}">{w}</a></li>' for w in _words(rng, vocab, 6)
    )
    return f"<nav><ul>{items}</ul></nav>"


def _sidebar(rng: random.Random, vocab) -> str:
    links = " ".join(
        f'<a href="/t/{w}">{w}</a>' for w in _words(rng, vocab, rng.randint(4, 8))
    )
    return f'<div class="sidebar"><h3>Tags</h3>{links}</div>'


def _related(rng: random.Random, vocab) -> str:
    """Link-dense but word-rich — dropped by the ld>1/3 rule, not by class
    (class name intentionally not in the drop regex)."""
    links = " ".join(
        f'<a href="/p/{i}">{_sentence(rng, vocab, 3)}</a>' for i in range(6)
    )
    return f'<div class="more-stories">{links}</div>'


def _comments(rng: random.Random, vocab) -> str:
    cs = "".join(
        f"<p>{_sentence(rng, vocab, rng.randint(3, 9))}</p>" for _ in range(3)
    )
    return f'<div class="comments"><h3>Comments</h3>{cs}</div>'


def gen_html_doc(idx: int, seed: int = 42) -> dict:
    """One deterministic page: {doc_id, html, main_text, spans}."""
    rng = random.Random(f"html:{seed}:{idx}")
    ascii_words, _uni = _vocab(seed)
    site = rng.choice(_SITES)

    headline = _sentence(rng, ascii_words, rng.randint(4, 8)).title()
    n_paras = rng.randint(3, 6)
    paras: List[Tuple[str, str]] = []  # (html_inner, expected_text)
    short_at = rng.randint(1, n_paras - 2) if (n_paras >= 3 and rng.random() < 0.5) else -1
    imgs_after: List[Tuple[int, str]] = []
    for i in range(n_paras):
        if i == short_at:
            txt = _sentence(rng, ascii_words, rng.randint(3, 6))
            paras.append((txt, txt))
            continue
        n = rng.randint(18, 40)
        ws = _words(rng, ascii_words, n)
        k = rng.randrange(2, n - 2)
        style = rng.random()
        if style < 0.3:
            inner = " ".join(ws[:k]) + f" <b>{ws[k]}</b> " + " ".join(ws[k + 1 :])
        elif style < 0.5:
            inner = (
                " ".join(ws[:k])
                + f' <a href="/w/{ws[k]}">{ws[k]}</a> '
                + " ".join(ws[k + 1 :])
            )
        elif style < 0.65:
            inner = " ".join(ws[:k]) + " &amp; " + " ".join(ws[k:])
            paras.append((inner, " ".join(ws[:k]) + " & " + " ".join(ws[k:])))
            if rng.random() < 0.4:
                imgs_after.append((len(paras) - 1, f"/img/{seed}-{idx}-{i}.png"))
            continue
        else:
            inner = " ".join(ws)
        paras.append((inner, " ".join(ws)))
        if rng.random() < 0.4:
            imgs_after.append((len(paras) - 1, f"/img/{seed}-{idx}-{i}.png"))

    img_of = dict(imgs_after)
    article_parts = [f"<h1>{headline}</h1>"]
    for i, (inner, _txt) in enumerate(paras):
        article_parts.append(f"<p>{inner}</p>")
        if i in img_of:
            article_parts.append(f'<img src="{img_of[i]}" alt="figure">')
    article = "<article>" + "".join(article_parts) + "</article>"

    html_doc = (
        "<!DOCTYPE html><html><head>"
        f"<title>{site} - {headline}</title>"
        "<style>body{margin:0}</style>"
        "<script>var x = '<p>not content</p>';</script>"
        "</head><body>"
        + _nav(rng, ascii_words)
        + f'<header><h1 class="site">{site.title()} Daily</h1></header>'
        + _sidebar(rng, ascii_words)
        + article
        + _related(rng, ascii_words)
        + _comments(rng, ascii_words)
        + f'<footer><p>© 2024 {site} · <a href="/privacy">privacy</a></p></footer>'
        "</body></html>"
    )

    # structural golden: headline + paragraphs (+ media) in order
    spans: List[dict] = []
    offset = 0
    spans.append({"kind": "heading", "text": headline, "media_ref": None, "offset": 0})
    offset += len(headline) + 1
    for i, (_inner, txt) in enumerate(paras):
        spans.append({"kind": "block", "text": txt, "media_ref": None, "offset": offset})
        offset += len(txt) + 1
        if i in img_of:
            spans.append(
                {
                    "kind": "media",
                    "text": None,
                    "media_ref": hashlib.md5(img_of[i].encode()).hexdigest(),
                    "offset": offset - 1,
                }
            )

    # structural block statistics: tag/class-pruned subtrees (head, nav,
    # header, sidebar, comments, footer) never reach the classifier; the
    # survivors are the article h1 + paragraphs (content) and the link-dense
    # related div (boilerplate by the ld rule)
    # each inter-paragraph <img> forms its own (kept) block
    stats = {
        "n_blocks": 2 + len(paras) + len(img_of),
        "n_content_blocks": 1 + len(paras) + len(img_of),
        "n_boilerplate_blocks": 1,
        "content_words": len(headline.split())
        + sum(len(t.split()) for _i, t in paras),
        "n_media": len(img_of),
    }

    got = extract_main_content(html_doc)
    assert got == spans, (
        f"extractor/golden divergence for doc {idx}:\n"
        f"expected {spans[:4]}...\n     got {got[:4]}..."
    )
    from docprompt_spark.html_extract import boilerplate_stats

    got_stats = boilerplate_stats(html_doc)
    for k, v in stats.items():
        assert got_stats[k] == v, f"stats divergence doc {idx} {k}: {got_stats[k]} != {v}"

    main_text = "\n".join(s["text"] for s in spans if s["text"] is not None)
    return {
        "doc_id": f"html-{seed}-{idx:08d}",
        "html": html_doc,
        "main_text": main_text,
        "spans": spans,
        "stats": stats,
    }


def gen_html_corpus(n_docs: int, seed: int = 42) -> List[dict]:
    return [gen_html_doc(i, seed=seed) for i in range(n_docs)]
