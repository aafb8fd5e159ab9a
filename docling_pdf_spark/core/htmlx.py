"""HTML main-content extraction: DOM-node text-density boilerplate strip
(north_star: "HTML boilerplate stripping via DOM-node density
heuristics").

The reference has no HTML path (it is PDF-only, docling-pdf
`main.py:102`); the north_rule adds interleaved HTML payloads. The
heuristic here is the published Boilerpipe family (Kohlschütter et al.,
"Boilerplate Detection using Shallow Text Features", WSDM 2010):

  * subtrees under structural-chrome tags (nav/header/footer/aside,
    plus script/style) are dropped wholesale;
  * block-level elements are kept iff they carry enough text
    (>= MIN_BLOCK_TEXT chars after whitespace-collapse) and are not
    link-dense (anchor-chars / total-chars <= MAX_LINK_DENSITY);
  * <table> elements become table blocks (rows joined by newline,
    cells by ' | ') — the analog of the reference's docling table
    items (pdf_extractor.py:395-401);
  * <img> elements become image blocks carrying src as media_ref —
    the analog of docling picture items (pdf_extractor.py:404-410).

Pure stdlib (html.parser), no Spark imports; shared by oracle and UDF.
"""

from __future__ import annotations

from dataclasses import dataclass
from html.parser import HTMLParser

from docling_pdf_spark.conf import (
    BLOCK_TAGS,
    DROP_TAGS,
    MAX_LINK_DENSITY,
    MIN_BLOCK_TEXT,
)

_VOID_TAGS = frozenset({"br", "hr", "img", "input", "meta", "link", "area", "col", "embed", "source", "track", "wbr"})


@dataclass
class HtmlBlock:
    kind: str  # 'text' | 'table' | 'image'
    text: str
    media_ref: str | None = None


def _collapse(s: str) -> str:
    return " ".join(s.split())


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[HtmlBlock] = []
        self._drop_depth = 0
        self._anchor_depth = 0
        # innermost-block buffer stack: [text_parts, link_chars]
        self._stack: list[tuple[list[str], list[int]]] = []
        # table state
        self._table_depth = 0
        self._rows: list[list[str]] = []
        self._cell: list[str] | None = None

    # -- tag events ------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in DROP_TAGS:
            self._drop_depth += 1
            return
        if self._drop_depth:
            return
        if tag == "img":
            d = dict(attrs)
            alt = _collapse(d.get("alt") or "")
            src = d.get("src") or None
            self.blocks.append(HtmlBlock("image", alt, src))
            return
        if tag == "table":
            self._table_depth += 1
            if self._table_depth == 1:
                self._rows = []
            return
        if self._table_depth:
            if tag == "tr":
                self._rows.append([])
            elif tag in ("td", "th"):
                self._cell = []
            return
        if tag == "a":
            self._anchor_depth += 1
        if tag in BLOCK_TAGS:
            self._stack.append(([], [0]))

    def handle_endtag(self, tag: str) -> None:
        if tag in DROP_TAGS:
            self._drop_depth = max(0, self._drop_depth - 1)
            return
        if self._drop_depth:
            return
        if tag == "table":
            if self._table_depth == 1:
                text = "\n".join(
                    " | ".join(cell for cell in row) for row in self._rows if row
                )
                if text.strip():
                    self.blocks.append(HtmlBlock("table", text))
                self._rows = []
            self._table_depth = max(0, self._table_depth - 1)
            return
        if self._table_depth:
            if tag in ("td", "th") and self._cell is not None:
                row = self._rows[-1] if self._rows else None
                if row is None:
                    self._rows.append([])
                    row = self._rows[-1]
                row.append(_collapse(" ".join(self._cell)))
                self._cell = None
            return
        if tag == "a":
            self._anchor_depth = max(0, self._anchor_depth - 1)
        if tag in BLOCK_TAGS and self._stack:
            parts, link = self._stack.pop()
            text = _collapse(" ".join(parts))
            if not text:
                return
            density = link[0] / max(1, len(text))
            if len(text) >= MIN_BLOCK_TEXT and density <= MAX_LINK_DENSITY:
                self.blocks.append(HtmlBlock("text", text))

    # -- text events -----------------------------------------------
    def handle_data(self, data: str) -> None:
        if self._drop_depth or not data.strip():
            return
        if self._table_depth:
            if self._cell is not None:
                self._cell.append(data)
            return
        if self._stack:
            parts, link = self._stack[-1]
            parts.append(data)
            if self._anchor_depth:
                link[0] += len(_collapse(data))


# ---------------------------------------------------------------------
# fast tokenizer: a compiled-regex scanner that drives the SAME
# _Extractor state machine as stdlib html.parser. ~4× faster (the
# stdlib tokenizer dominated extraction CPU); the stdlib path is kept
# and an equivalence test pins both to identical output on the corpus.
# ---------------------------------------------------------------------

import re
from html import unescape as _unescape_entities

# tokenization fidelity: reuse html.parser's OWN compiled tolerant
# regexes for tag-end location and attribute parsing, so malformed
# markup tokenizes byte-identically to the stdlib path — the speedup
# comes from replacing the per-character goahead() event loop with one
# regex scan per construct, not from different grammar rules.
from html import parser as _hp

_LT_RE = re.compile(r"<")
_COMMENT_CLOSE = re.compile(r"--\s*>")
_DECL_CLOSE = re.compile(r">")
_RAWTEXT_CLOSE = {
    "script": re.compile(r"</\s*script", re.I),
    "style": re.compile(r"</\s*style", re.I),
}


def _emit_data(machine: _Extractor, text: str) -> None:
    if text:
        machine.handle_data(_unescape_entities(text) if "&" in text else text)


def _eof_recover(machine: _Extractor, html: str, i: int) -> int:
    """stdlib goahead() recovery for an unclosed construct at EOF:
    emit raw data up to the first '>' (else next '<', else one char)
    and resume there (html.parser goahead, k<0 branch)."""
    gt = html.find(">", i + 1)
    if gt >= 0:
        k = gt + 1
    else:
        lt2 = html.find("<", i + 1)
        k = lt2 if lt2 >= 0 else i + 1
    machine.handle_data(html[i:k])  # raw: stdlib recovery skips unescape
    return k


def _fast_feed(machine: _Extractor, html: str) -> None:  # noqa: C901
    pos = 0
    n = len(html)
    while pos < n:
        lt = html.find("<", pos)
        if lt < 0:
            _emit_data(machine, html[pos:])
            return
        if lt > pos:
            _emit_data(machine, html[pos:lt])
        pos = lt
        nxt = html[lt + 1 : lt + 2]
        if nxt == "/":  # end tag (stdlib endtagfind semantics)
            m = _hp.endtagfind.match(html, lt)
            if m:
                machine.handle_endtag(m.group(1).lower())
                pos = m.end()
            else:  # tolerant bogus end tag: skip to '>'
                gt = html.find(">", lt)
                if gt < 0:
                    _emit_data(machine, html[lt:])
                    return
                pos = gt + 1
            continue
        if nxt == "!":
            if html.startswith("<!--", lt):
                m = _COMMENT_CLOSE.search(html, lt + 4)
                pos = m.end() if m else _eof_recover(machine, html, lt)
            else:  # declaration / bogus comment: to first '>'
                m = _DECL_CLOSE.search(html, lt + 2)
                pos = m.end() if m else _eof_recover(machine, html, lt)
            continue
        if nxt == "?":
            m = _hp.piclose.search(html, lt + 2)
            pos = m.end() if m else _eof_recover(machine, html, lt)
            continue
        tm = _hp.tagfind_tolerant.match(html, lt + 1)
        if not tm:  # bare '<' in text
            _emit_data(machine, "<")
            pos = lt + 1
            continue
        em = _hp.locatestarttagend_tolerant.match(html, lt)
        end = em.end() if em else lt
        if html.startswith(">", end):
            end += 1
            self_close = False
        elif html.startswith("/>", end):
            end += 2
            self_close = True
        else:  # unterminated start tag: stdlib emits it as data
            _emit_data(machine, html[lt : lt + 1])
            pos = lt + 1
            continue
        tag = tm.group(1).lower()
        attrs = []
        if tag == "img":  # attrs only materialized where consumed
            k = tm.end()
            while k < end - 1:
                am = _hp.attrfind_tolerant.match(html, k)
                if not am:
                    break
                name, rest = am.group(1).lower(), am.group(3)
                if rest and rest[:1] in "'\"" and rest[-1:] == rest[:1]:
                    rest = rest[1:-1]
                attrs.append((name, _unescape_entities(rest) if rest and "&" in rest else rest))
                k = am.end()
        machine.handle_starttag(tag, attrs)
        pos = end
        if self_close:
            machine.handle_endtag(tag)
            continue
        if tag in _RAWTEXT_CLOSE:  # script/style content is raw text (CDATA mode)
            cm = _RAWTEXT_CLOSE[tag].search(html, pos)
            if cm is None:
                machine.handle_data(html[pos:])
                return  # stdlib leaves the tag unclosed at EOF
            machine.handle_data(html[pos : cm.start()])
            gt = html.find(">", cm.start())
            machine.handle_endtag(tag)
            pos = (gt + 1) if gt >= 0 else n


def extract_html(html: str, engine: str = "fast") -> list[HtmlBlock]:
    """Parse one HTML payload into ordered content blocks.

    Emission order = document order of block-close / img / table-close
    events — deterministic for any input; never raises (mirroring the
    reference's never-crash stance, pdf_extractor.py:357-369).

    engine='fast' (default): regex tokenizer; engine='stdlib':
    html.parser tokenizer. Both drive the identical state machine and
    are pinned equal on the corpus by tests.
    """
    p = _Extractor()
    try:
        if engine == "fast":
            _fast_feed(p, html or "")
        else:
            p.feed(html or "")
            p.close()
    except Exception:
        pass  # salvage whatever was emitted before the failure
    return p.blocks
