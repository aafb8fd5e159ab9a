"""Unit tests for the HTML boilerplate strip (north_star DOM-density heuristic)."""

from __future__ import annotations

from docling_pdf_spark.core.htmlx import extract_html

PAGE = """
<html><body>
<nav><a href="/a">home</a> <a href="/b">blog</a> <a href="/c">about us now</a></nav>
<header><h1>Site</h1></header>
<article>
  <p>This is the real main content paragraph with plenty of prose in it.</p>
  <p>tiny</p>
  <p>A second substantial paragraph that easily clears the density bar.</p>
</article>
<aside><ul>
  <li><a href="#x">promoted link one goes here</a></li>
  <li><a href="#y">promoted link two goes here</a></li>
</ul></aside>
<footer><a href="/tos">terms of service</a> copyright</footer>
</body></html>
"""


def test_boilerplate_dropped_content_kept():
    blocks = extract_html(PAGE)
    texts = [b.text for b in blocks if b.kind == "text"]
    assert texts == [
        "This is the real main content paragraph with plenty of prose in it.",
        "A second substantial paragraph that easily clears the density bar.",
    ]


def test_short_and_link_dense_blocks_dropped():
    html = (
        "<p>tiny</p>"
        '<li><a href="#">this entire block is one long anchor of link text</a></li>'
        "<p>legitimate content block that is long enough to keep around</p>"
    )
    texts = [b.text for b in extract_html(html) if b.kind == "text"]
    assert texts == ["legitimate content block that is long enough to keep around"]


def test_table_becomes_table_block():
    html = "<table><tr><td>a</td><td>b</td></tr><tr><td>c</td><td>d</td></tr></table>"
    blocks = extract_html(html)
    assert len(blocks) == 1
    assert blocks[0].kind == "table"
    assert blocks[0].text == "a | b\nc | d"


def test_img_becomes_image_block_with_media_ref():
    blocks = extract_html('<p>intro text long enough to keep here ok</p><img src="cdn://1.png" alt="fig 1">')
    img = [b for b in blocks if b.kind == "image"]
    assert len(img) == 1
    assert img[0].media_ref == "cdn://1.png"
    assert img[0].text == "fig 1"


def test_nested_blocks_no_duplicate_emission():
    html = "<article><p>inner paragraph easily long enough to keep here</p></article>"
    texts = [b.text for b in extract_html(html) if b.kind == "text"]
    assert texts == ["inner paragraph easily long enough to keep here"]


def test_malformed_html_never_raises():
    assert isinstance(extract_html("<p><b>unclosed <table><tr><td>x"), list)
    assert extract_html("") == []
    assert extract_html(None) == []


def test_fast_engine_equals_stdlib_on_corpus():
    """The regex tokenizer and html.parser must produce identical block
    streams over every html payload in a 3000-doc fixture corpus."""
    from docling_pdf_spark.fixtures import gen_documents

    t = gen_documents(3000, adversarial=False).to_pylist()
    htmls = [s["text"] for row in t for s in row["spans"] if s["kind"] == "html"]
    assert len(htmls) > 500
    for h in htmls:
        fast = [(b.kind, b.text, b.media_ref) for b in extract_html(h, "fast")]
        std = [(b.kind, b.text, b.media_ref) for b in extract_html(h, "stdlib")]
        assert fast == std


def test_fast_engine_equals_stdlib_on_nasty_cases():
    cases = [
        "",
        "plain text no tags at all but quite long enough to keep here",
        "<p>entity &amp; test &lt;kept&gt; long enough to pass density</p>",
        "<!-- comment --><p>after a comment this is long enough to keep</p>",
        "<script>if (a<b) { x = '</div>'; }</script><p>content after script block here</p>",
        "<style>p > a { color: red }</style><p>content after style block okay</p>",
        "<p>unclosed paragraph that never ends and is long enough to keep",
        "<P>UPPERCASE tags should work the same way here alright then</P>",
        "<img src='x.png' alt='a figure'/><p>self closing img then text long enough</p>",
        "<img src=bare.png alt=word><p>bare attrs image then enough text to keep</p>",
        "<table><tr><td>a &amp; b</td></tr></table>",
        "<div><p>nested <a href='#'>link text</a> inside paragraph long enough</p></div>",
        "<![CDATA[ raw <p>stuff</p> ]]><p>after cdata block this text is long enough</p>",
        "<?xml version='1.0'?><p>after processing instruction long enough to keep</p>",
        "<p>broken < angle bracket inside text long enough to keep around</p>",
    ]
    for h in cases:
        fast = [(b.kind, b.text, b.media_ref) for b in extract_html(h, "fast")]
        std = [(b.kind, b.text, b.media_ref) for b in extract_html(h, "stdlib")]
        assert fast == std, h


def test_fast_engine_equals_stdlib_on_random_soup():
    """Hypothesis fuzz: random tag soup must produce identical block
    streams from both engines (the fast path's safety net beyond the
    well-formed corpus)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    fragment = st.one_of(
        st.text(alphabet="ab<> /='\"&;xyz-!?.", min_size=0, max_size=12),
        st.sampled_from(
            ["<p>", "</p>", "<div>", "</div>", "<a href='#'>", "</a>",
             "<img src='u' alt='v'>", "<table>", "</table>", "<tr>", "<td>",
             "</td>", "</tr>", "<nav>", "</nav>", "<script>", "</script>",
             "&amp;", "<!-- c -->", "<br/>", "long enough paragraph text here ok"]
        ),
    )
    soup = st.lists(fragment, min_size=0, max_size=30).map("".join)

    @settings(max_examples=300, deadline=None)
    @given(soup)
    def check(html):
        fast = [(b.kind, b.text, b.media_ref) for b in extract_html(html, "fast")]
        std = [(b.kind, b.text, b.media_ref) for b in extract_html(html, "stdlib")]
        assert fast == std, repr(html)

    check()


def test_fast_engine_equals_stdlib_on_markup_soup_fuzz():
    """Bug-for-bug tokenizer equivalence on adversarial markup soup —
    the fast scanner replicates goahead()/parse_* control flow exactly
    (round-1 residual divergence was ~1-in-800 soups; now 0 in 200k
    offline; 10k seeded here as the regression gate)."""
    import random

    rng = random.Random(42)
    tags = ["p", "div", "a", "nav", "table", "tr", "td", "img", "li",
            "article", "footer", "span", "b", "script", "style"]
    pieces = ["<", ">", "</", "/>", "&amp;", "&", "&#65;", "<!--", "-->",
              "<!", "<?", "?>", "=", "'", '"', " ", "word", "txt123",
              "\n", "\\", "(", ")", "<![", "<![cdata[", "]]>",
              "<!doctype html>"]

    def soup(n: int) -> str:
        parts = []
        for _ in range(n):
            r = rng.random()
            if r < 0.35:
                t = rng.choice(tags)
                if rng.random() < 0.5:
                    attr = "" if rng.random() < 0.5 else f" href='{rng.choice(pieces)}'"
                    parts.append(f"<{t}{attr}" + (">" if rng.random() < 0.8 else ""))
                else:
                    parts.append(f"</{t}" + (">" if rng.random() < 0.8 else ""))
            elif r < 0.8:
                parts.append(rng.choice(pieces))
            else:
                parts.append("".join(
                    rng.choice("abcdefgh <>&='\"/!?-,") for _ in range(rng.randint(1, 12))
                ))
        return "".join(parts)

    for _ in range(10_000):
        s = soup(rng.randint(2, 40))
        fast = [(b.kind, b.text, b.media_ref) for b in extract_html(s, "fast")]
        std = [(b.kind, b.text, b.media_ref) for b in extract_html(s, "stdlib")]
        assert fast == std, repr(s)
