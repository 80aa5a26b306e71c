"""HTML main-content extraction: boilerplate strip + DOM heuristics.

The north rule's extraction surface spans "HTML boilerplate strip, PDF/layout
parse, DOM heuristics". The reference library is PDF-only, so this module is
the HTML half, built from scratch on public techniques:

* a regex-based HTML tokenizer (tags, raw-text elements, comments, entity
  decoding via the stdlib ``html`` module),
* DOM-ish block segmentation on block-level boundaries with per-block
  features: word count, link density (share of characters inside <a>), tag
  path, DROP-zone membership,
* a boilerplate classifier in the spirit of Boilerpipe's published
  NumWordsRulesClassifier (Kohlschütter et al., WSDM 2010 — word-count +
  link-density decision rules over previous/current/next blocks) combined
  with Readability-style structural pruning (nav/header/footer/aside/form
  subtrees and ``class``/``id`` matching nav|menu|sidebar|footer|ad|banner|
  comment|promo are dropped outright),
* ordered span emission compatible with the engine's span contract:
  (kind, text, media_ref, offset) — headings/paragraphs become text spans,
  <img> inside retained content becomes a media span (media_ref =
  md5 of the src attribute).

Everything is per-document pure Python executed inside Arrow-batched
``mapInPandas`` (see queries.html_main_content); no external parser libs.
"""

from __future__ import annotations

import hashlib
import html as _htmlmod
import re
from typing import Dict, List, Optional, Tuple

BLOCK_TAGS = {
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "td", "th",
    "article", "section", "blockquote", "pre", "main", "figcaption",
    "ul", "ol", "table", "tr", "body", "html", "header", "footer", "nav",
    "aside", "form",
}
# subtrees dropped outright (Readability-style structural pruning)
DROP_TAGS = {"script", "style", "noscript", "template", "svg", "iframe",
             "nav", "header", "footer", "aside", "form", "button", "head"}
_DROP_CLASS_RE = re.compile(
    r"(?:^|[\s_-])(nav|menu|sidebar|footer|foot|ads?|advert|banner|comments?"
    r"|promo|share|social|breadcrumb|widget)(?:$|[\s_-])",
    re.I,
)

_TOKEN_RE = re.compile(
    r"<!--.*?-->"                 # comments
    r"|<!\[CDATA\[.*?\]\]>"
    r"|<!DOCTYPE[^>]*>"
    r"|</(?P<close>[a-zA-Z][a-zA-Z0-9-]*)\s*>"
    r"|<(?P<open>[a-zA-Z][a-zA-Z0-9-]*)(?P<attrs>[^>]*?)(?P<selfclose>/)?>"
    r"|(?P<text>[^<]+)",
    re.S,
)
_RAWTEXT_CLOSE = {t: re.compile(rf"</{t}\s*>", re.I | re.S)
                  for t in ("script", "style", "noscript", "template")}
_ATTR_RE = re.compile(
    r"([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s\"'>]+)"
)
_WS_RE = re.compile(r"\s+")
VOID_TAGS = {"img", "br", "hr", "meta", "link", "input", "area", "base",
             "col", "embed", "source", "track", "wbr"}


def _parse_attrs(raw: str) -> Dict[str, str]:
    out = {}
    for m in _ATTR_RE.finditer(raw or ""):
        v = m.group(2)
        if v and v[0] in "\"'":
            v = v[1:-1]
        out[m.group(1).lower()] = v
    return out


class _Block:
    __slots__ = ("tag", "texts", "link_chars", "dropped", "images", "order")

    def __init__(self, tag: str, dropped: bool, order: int) -> None:
        self.tag = tag
        self.texts: List[str] = []
        self.link_chars = 0
        self.dropped = dropped
        self.images: List[str] = []  # src attrs in document order
        self.order = order

    @property
    def text(self) -> str:
        return _WS_RE.sub(" ", "".join(self.texts)).strip()

    @property
    def n_words(self) -> int:
        t = self.text
        return len(t.split()) if t else 0

    @property
    def link_density(self) -> float:
        t = self.text
        return (self.link_chars / len(t)) if t else 0.0


def segment_blocks(doc: str) -> List[_Block]:
    """Tokenize + segment into text blocks with features. A block closes at
    any block-level tag boundary; inline tags accumulate into the current
    block. DROP-zone state (forbidden subtrees, boilerplate class/id) is
    tracked with a depth counter so nested content stays dropped."""
    blocks: List[_Block] = []
    cur: Optional[_Block] = None
    drop_depth = 0  # >0 = inside a dropped subtree
    link_depth = 0
    order = 0
    stack: List[Tuple[str, bool]] = []  # (tag, was_drop_subtree_root)

    def close_block() -> None:
        nonlocal cur
        if cur is not None and (cur.text or cur.images):
            blocks.append(cur)
        cur = None

    pos = 0
    n = len(doc)
    while pos < n:
        m = _TOKEN_RE.match(doc, pos)
        if m is None:
            break
        pos = m.end()
        text = m.group("text")
        if text is not None:
            if drop_depth:
                continue
            decoded = _htmlmod.unescape(text)
            if cur is None:
                order += 1
                cur = _Block("p", False, order)
            cur.texts.append(decoded)
            if link_depth:
                cur.link_chars += len(_WS_RE.sub(" ", decoded).strip())
            continue
        tag_open = m.group("open")
        tag_close = m.group("close")
        if tag_open:
            tag = tag_open.lower()
            attrs = _parse_attrs(m.group("attrs"))
            if tag in ("script", "style", "noscript", "template"):
                # raw-text element: skip to its close tag entirely
                cm = _RAWTEXT_CLOSE[tag].search(doc, pos)
                pos = cm.end() if cm else n
                continue
            is_drop_root = (
                tag in DROP_TAGS
                or bool(_DROP_CLASS_RE.search(attrs.get("class", "")))
                or bool(_DROP_CLASS_RE.search(attrs.get("id", "")))
            )
            if tag == "img":
                if not drop_depth and not is_drop_root:
                    src = attrs.get("src", "")
                    if src:
                        if cur is None:
                            order += 1
                            cur = _Block("p", False, order)
                        cur.images.append(src)
                continue
            if tag in VOID_TAGS or m.group("selfclose"):
                if is_drop_root:
                    continue
                continue
            if tag == "a":
                link_depth += 1
            if tag in BLOCK_TAGS:
                close_block()
            if is_drop_root:
                drop_depth += 1
            stack.append((tag, is_drop_root))
            if tag in BLOCK_TAGS and not drop_depth:
                order += 1
                cur = _Block(tag, False, order)
            continue
        if tag_close:
            tag = tag_close.lower()
            if tag == "a" and link_depth:
                link_depth -= 1
            # unwind the stack to the matching open (tolerates misnesting);
            # restore BOTH drop_depth and link_depth for unwound tags, or an
            # unclosed <a> permanently inflates link_chars for every later
            # block and flips real content to boilerplate
            for k in range(len(stack) - 1, -1, -1):
                if stack[k][0] == tag:
                    for _t, was_drop in stack[k:]:
                        if was_drop:
                            drop_depth = max(0, drop_depth - 1)
                        if _t == "a" and _t != tag and link_depth:
                            link_depth -= 1
                    del stack[k:]
                    break
            if tag in BLOCK_TAGS:
                close_block()
            continue
    close_block()
    return blocks


# Boilerpipe NumWordsRulesClassifier thresholds (Kohlschütter et al. 2010;
# the published decision rule over (prev, curr, next) blocks)
def _content_rule(prev_words: int, prev_ld: float, curr_words: int,
                  curr_ld: float, next_words: int) -> bool:
    if curr_ld > 0.333333:
        return False
    if prev_ld <= 0.555556:
        return curr_words > 16 or next_words > 15 or prev_words > 4
    return curr_words > 40 or next_words > 17


def classify_blocks(blocks: List[_Block]) -> List[bool]:
    """True = main content. Headings adopt the verdict of the following
    block (a heading above kept content is kept — Readability behavior)."""
    verdicts: List[bool] = []
    n = len(blocks)
    for i, b in enumerate(blocks):
        pw = blocks[i - 1].n_words if i > 0 else 0
        pl = blocks[i - 1].link_density if i > 0 else 0.0
        nw = blocks[i + 1].n_words if i + 1 < n else 0
        verdicts.append(_content_rule(pw, pl, b.n_words, b.link_density, nw))
    for i, b in enumerate(blocks):  # heading adoption
        if b.tag in ("h1", "h2", "h3", "h4", "h5", "h6") and i + 1 < n:
            verdicts[i] = verdicts[i + 1]
    return verdicts


def extract_main_content(doc: str) -> List[dict]:
    """Ordered span sequence of the main content:
    [{kind, text, media_ref, offset}] — kind 'heading'|'block'|'media';
    offset = char offset within the concatenated main text (blocks joined
    by single newlines), media offset = end of the preceding kept text."""
    blocks = segment_blocks(doc)
    verdicts = classify_blocks(blocks)
    spans: List[dict] = []
    offset = 0
    last_text_end = 0  # media offsets = end of preceding kept text (the
    # same convention as the PDF pipeline's assemble_page_spans)
    for b, keep in zip(blocks, verdicts):
        if not keep:
            continue
        text = b.text
        if text:
            kind = "heading" if b.tag in ("h1", "h2", "h3", "h4", "h5", "h6") else "block"
            spans.append(
                {"kind": kind, "text": text, "media_ref": None, "offset": offset}
            )
            last_text_end = offset + len(text)
            offset = last_text_end + 1  # newline joiner
        for src in b.images:
            spans.append(
                {
                    "kind": "media",
                    "text": None,
                    "media_ref": hashlib.md5(src.encode()).hexdigest(),
                    "offset": last_text_end,
                }
            )
    return spans


def boilerplate_stats(doc: str) -> dict:
    """Per-document block statistics for the quality/analysis surface."""
    blocks = segment_blocks(doc)
    verdicts = classify_blocks(blocks)
    kept = [b for b, v in zip(blocks, verdicts) if v]
    dropped = [b for b, v in zip(blocks, verdicts) if not v]
    return {
        "n_blocks": len(blocks),
        "n_content_blocks": len(kept),
        "n_boilerplate_blocks": len(dropped),
        "content_words": sum(b.n_words for b in kept),
        "boilerplate_words": sum(b.n_words for b in dropped),
        "n_media": sum(len(b.images) for b in kept),
    }
