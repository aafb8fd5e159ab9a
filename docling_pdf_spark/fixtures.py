"""Deterministic interleaved-document corpus synthesizer (FIXTURES.md §1).

Seeded `random.Random` only — no wall clock, no external data (driver
mandate). Produces the north-rule input table

    documents(doc_id:string,
              spans:array<struct<kind,text,media_ref,offset:int32>>)

with the FIXTURES.md kind mix (≈55% text / 20% html / 15% pdf / 10%
media), Zipf-skewed payload sizes with an oversized cohort (the skew the
salting stage must tame — analog of the reference's 50 MB upload cap
world, docling-pdf config.py:20), and an adversarial cohort exercising
every ladder branch of SURVEY.md §2a.
"""

from __future__ import annotations

import base64
import random

import pyarrow as pa
import pyarrow.parquet as pq

from docling_pdf_spark.core.pdfgen import PageSpec, make_pdf
from docling_pdf_spark.schemas import DOCUMENTS_PA

SEED = 20250816

_WORDS = (
    "spark arrow parquet iceberg shuffle partition salted skew vectorized "
    "document extraction layout reading order span media text html pdf "
    "pipeline manifest lineage checkpoint resume throughput efficiency "
    "column pruning predicate pushdown broadcast catalyst tungsten codegen"
).split()

_CJK = "文档提取流水线分区倾斜向量化火花箭头"
_EMOJI = "🔥📄🧱🚀"
_RTL = "استخراج المستندات بالتوازي"


def _sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n)).capitalize() + "."


def _paragraph(rng: random.Random, n_sents: int, wps: int = 9) -> str:
    return " ".join(_sentence(rng, wps) for _ in range(n_sents))


def _mk_span(kind: str, text: str, media_ref: str | None, offset: int) -> dict:
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


def _html_payload(rng: random.Random, scale: int = 1) -> str:
    """Boilerplate chrome around 1-5 dense article nodes (FIXTURES.md §1)."""
    nav_links = " ".join(
        f'<a href="/{w}">{w}</a>' for w in rng.sample(_WORDS, k=6)
    )
    paras = "\n".join(
        f"<p>{_paragraph(rng, rng.randint(2, 4) * scale)}</p>"
        for _ in range(rng.randint(1, 5))
    )
    sidebar = "".join(
        f'<li><a href="#{w}">{w} {w}</a></li>' for w in rng.sample(_WORDS, k=8)
    )
    table = ""
    if rng.random() < 0.35:
        rows = "".join(
            "<tr>"
            + "".join(f"<td>{rng.choice(_WORDS)} {rng.randint(0, 99)}</td>" for _ in range(3))
            + "</tr>"
            for _ in range(rng.randint(2, 4))
        )
        table = f"<table>{rows}</table>"
    img = ""
    if rng.random() < 0.3:
        img = f'<img src="cdn://{rng.randint(0, 9999):04d}.png" alt="figure {rng.randint(1, 9)}">'
    return (
        "<html><head><title>t</title></head><body>"
        f"<nav>{nav_links}</nav><header><h1>{rng.choice(_WORDS)}</h1></header>"
        f"<article>{paras}{table}{img}</article>"
        f'<aside><ul>{sidebar}</ul></aside>'
        f"<footer><a href='/about'>about</a> <a href='/tos'>terms</a></footer>"
        "</body></html>"
    )


def _pdf_pages(rng: random.Random, n_pages: int) -> list[PageSpec]:
    pages = []
    for _ in range(n_pages):
        two_col = rng.random() < 0.3
        texts = []
        n_boxes = rng.randint(2, 7)
        for _b in range(n_boxes):
            x = rng.choice((60.0, 320.0)) if two_col else 72.0 + rng.randint(0, 3) * 8
            y = 760.0 - rng.randint(0, 9) * 70
            texts.append((x, y, _sentence(rng, rng.randint(4, 10))))
        pages.append(PageSpec(texts=texts, n_images=1 if rng.random() < 0.25 else 0))
    return pages


_PRODUCERS = (None, "fixture-writer 1.4", "sparkpdf 2.1", "legacy-scan 0.9")


def _pdf_payload(rng: random.Random, n_pages: int, **kw) -> str:
    pages = _pdf_pages(rng, n_pages)
    kw.setdefault("producer", rng.choice(_PRODUCERS))
    return base64.b64encode(make_pdf(pages, **kw)).decode("ascii")


def _normal_doc(rng: random.Random, doc_id: str, oversized: bool) -> dict:
    spans: list[dict] = []
    n_spans = rng.randint(1, 12)
    scale = 100 if oversized else 1
    offset = 0
    for _ in range(n_spans):
        r = rng.random()
        if r < 0.55:
            text = _paragraph(rng, rng.randint(1, 3) * scale)
            spans.append(_mk_span("text", text, None, offset))
        elif r < 0.75:
            spans.append(_mk_span("html", _html_payload(rng, scale=min(scale, 10)), None, offset))
        elif r < 0.90:
            n_pages = rng.randint(1, 8) * (8 if oversized else 1)
            spans.append(_mk_span("pdf", _pdf_payload(rng, n_pages), None, offset))
        else:
            k = rng.randint(0, 9)
            spans.append(
                _mk_span("media", f"caption {rng.choice(_WORDS)}", f"img://{doc_id}/{k}", offset)
            )
        offset += len(spans[-1]["text"] or "") + 1
    return {"doc_id": doc_id, "spans": spans}


def _adversarial_docs(rng: random.Random) -> list[dict]:
    """One doc per FIXTURES.md §1a row; ids are stable."""

    def pdf64(pages: list[PageSpec], **kw) -> str:
        return base64.b64encode(make_pdf(pages, **kw)).decode("ascii")

    simple = _pdf_pages(rng, 2)
    return [
        {"doc_id": "adv-bad-magic",
         "spans": [_mk_span("pdf", pdf64(simple, corrupt="no_magic"), None, 0)]},
        {"doc_id": "adv-zero-pages",
         "spans": [_mk_span("pdf", pdf64([]), None, 0)]},
        {"doc_id": "adv-invalid-boxes",
         "spans": [_mk_span("pdf", pdf64(
             [PageSpec(texts=[(72.0, 700.0, "repaired box page")],
                       media_box=(0, 0, 0, 0))]), None, 0)]},
        {"doc_id": "adv-corrupt-graph",
         "spans": [_mk_span("pdf", pdf64(simple, corrupt="truncate_xref"), None, 0)]},
        {"doc_id": "adv-garbage-graph",
         "spans": [_mk_span("pdf", pdf64(simple, corrupt="garbage_graph"), None, 0)]},
        {"doc_id": "adv-mangled-ops",
         "spans": [_mk_span("pdf", pdf64(simple, corrupt="mangle_ops"), None, 0)]},
        {"doc_id": "adv-oversized",
         "spans": [_mk_span("pdf", pdf64(_pdf_pages(rng, 64)), None, 0)]},
        {"doc_id": "adv-empty", "spans": []},
        {"doc_id": "adv-unicode",
         "spans": [
             _mk_span("text", f"{_CJK} {_EMOJI} {_RTL}", None, 0),
             _mk_span("pdf", pdf64([PageSpec(texts=[(72.0, 700.0, _CJK + " " + _RTL)])]), None, 1),
         ]},
        {"doc_id": "adv-encrypted",  # empty user password: readable, flagged
         "spans": [_mk_span("pdf", pdf64(simple, encrypted=True), None, 0)]},
        {"doc_id": "adv-needs-password",  # password required: distinct flag
         "spans": [_mk_span("pdf", pdf64(simple, needs_password=True), None, 0)]},
    ]


MEDIA_ASSETS_PA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("media_kind", pa.string()),
        ("data", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def gen_media_assets(n_assets: int, seed: int = SEED) -> pa.Table:
    """Opaque binary media assets with typed metadata (multimodal
    plumbing fixtures — payloads are deterministic pseudo-random bytes;
    real codecs are stubbed per the environment constraints)."""
    rng = random.Random(seed + 1)
    rows = []
    for i in range(n_assets):
        kind = rng.choice(("image", "image", "image", "audio", "video"))
        size = rng.randint(256, 8192) * (16 if rng.random() < 0.02 else 1)
        rows.append(
            {
                "media_ref": f"img://doc-{i:08d}/{rng.randint(0, 9)}",
                "media_kind": kind,
                "data": rng.randbytes(size),
                "width": rng.randint(16, 1024) if kind == "image" else None,
                "height": rng.randint(16, 1024) if kind == "image" else None,
                "duration_ms": rng.randint(1000, 60000) if kind != "image" else None,
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_ASSETS_PA)


def gen_documents(n_docs: int, seed: int = SEED, adversarial: bool = True) -> pa.Table:
    """Synthesize the corpus as a pyarrow Table (DOCUMENTS_PA schema)."""
    rng = random.Random(seed)
    docs: list[dict] = _adversarial_docs(rng) if adversarial else []
    for i in range(n_docs):
        oversized = rng.random() < 0.005  # FIXTURES.md: 0.5% oversized cohort
        docs.append(_normal_doc(rng, f"doc-{i:08d}", oversized))
    return pa.Table.from_pylist(docs, schema=DOCUMENTS_PA)


def write_corpus(path: str, n_docs: int, seed: int = SEED, adversarial: bool = True) -> str:
    """Write the corpus parquet (row groups sized for Spark splits)."""
    table = gen_documents(n_docs, seed=seed, adversarial=adversarial)
    pq.write_table(table, path, row_group_size=2048)
    return path
