"""Minimal deterministic PDF writer for fixtures (FIXTURES.md §1).

Generates a real (uncompressed) PDF subset: catalog → pages → page
objects with /MediaBox, content streams of positioned text ops
``BT /F1 12 Tf x y Td (…) Tj ET`` and image XObject draws, an xref
table and trailer. The geometry is real so the extractor's
reading-order sort by (page, -y, x) is genuine layout work
(north_star), mirroring what the reference delegates to docling
(docling-pdf `pdf_extractor.py:197`).

No external data, no wall clock, fully seeded by the caller.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class PageSpec:
    """One page: text boxes at (x, y) in PDF user space (y grows UP)."""

    texts: list[tuple[float, float, str]] = field(default_factory=list)
    media_box: tuple[float, float, float, float] = (0.0, 0.0, 595.0, 842.0)
    n_images: int = 0


def _esc(s: str) -> bytes:
    """PDF literal-string escaping; payload is UTF-8 bytes in parens."""
    return _esc_bytes(s.encode("utf-8"))


def _esc_bytes(b: bytes) -> bytes:
    return b.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


# ISO 32000-1 §7.6.3.3 standard padding string: the /U entry of a
# standard-security PDF whose USER password is empty derives from this
# constant — parse_strict uses it to tell "encrypted but readable"
# from "password required" (the reference's needs_password flag,
# docling-pdf pdf_extractor.py:591-612).
PDF_PAD = bytes(
    (0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
     0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
     0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A)
)


def make_pdf(
    pages: list[PageSpec],
    *,
    encrypted: bool = False,
    needs_password: bool = False,
    producer: str | None = None,
    info: dict[str, str] | None = None,
    corrupt: str | None = None,
) -> bytes:
    """Build PDF bytes.

    encrypted: attach a standard-security /Encrypt dictionary whose /U
      entry is the empty-user-password padding constant (readable).
    needs_password: like encrypted, but /U differs from the padding —
      a user password is required (implies encrypted).
    producer: attach an /Info dictionary with this /Producer string.
    info: extra /Info entries (Title, Author, CreationDate, ...) —
      string values only, merged with producer into one Info object.

    corrupt:
      None            — well-formed (strict rung parses it)
      'truncate_xref' — xref/trailer cut off mid-way (strict fails on the
                        object graph → lenient rung; analog of the backend
                        ladder docling-pdf pdf_extractor.py:694-739)
      'garbage_graph' — catalog points at a missing object (strict fails)
      'mangle_ops'    — text operators corrupted so even lenient finds no
                        BT/ET ops (raw string-sieve rung; analog of the
                        PyMuPDF fallback pdf_extractor.py:473-576)
      'no_magic'      — header lacks %PDF (admission reject, main.py:117)
    """
    objs: list[bytes] = []  # 1-indexed object bodies (without N 0 obj wrapper)

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    font_ref = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    page_refs: list[int] = []
    pages_ref_placeholder = None  # filled after we know the /Pages obj id

    page_bodies: list[tuple[int, PageSpec, int, list[int]]] = []
    for spec in pages:
        ops: list[bytes] = []
        for x, y, s in spec.texts:
            tj = b"(%s) Tj" % _esc(s)
            if corrupt == "mangle_ops":
                tj = b"(%s) XX" % _esc(s)  # not a Tj op; lenient finds nothing
            ops.append(b"BT /F1 12 Tf %.2f %.2f Td %s ET" % (x, y, tj))
            if corrupt == "mangle_ops":
                ops[-1] = ops[-1].replace(b"BT ", b"B~ ").replace(b" ET", b" E~")
        img_refs: list[int] = []
        for i in range(spec.n_images):
            img_refs.append(
                add(
                    b"<< /Type /XObject /Subtype /Image /Width 8 /Height 8 "
                    b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Length 64 >>\n"
                    b"stream\n" + bytes(64) + b"\nendstream"
                )
            )
            ops.append(b"q 8 0 0 8 %d 20 cm /Im%d Do Q" % (40 + 20 * i, i + 1))
        stream = b"\n".join(ops)
        contents_ref = add(
            b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream)
        )
        page_bodies.append((contents_ref, spec, len(img_refs), img_refs))

    pages_ref = len(objs) + len(page_bodies) + 1  # page objs next, then /Pages
    for contents_ref, spec, n_img, img_refs in page_bodies:
        xobj = b""
        if img_refs:
            xobj = b"/XObject << " + b" ".join(
                b"/Im%d %d 0 R" % (i + 1, r) for i, r in enumerate(img_refs)
            ) + b" >> "
        mb = spec.media_box
        page_refs.append(
            add(
                b"<< /Type /Page /Parent %d 0 R /MediaBox [%g %g %g %g] "
                b"/Resources << /Font << /F1 %d 0 R >> %s>> /Contents %d 0 R >>"
                % (pages_ref, mb[0], mb[1], mb[2], mb[3], font_ref, xobj, contents_ref)
            )
        )

    kids = b" ".join(b"%d 0 R" % r for r in page_refs)
    real_pages_ref = add(
        b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, len(page_refs))
    )
    assert real_pages_ref == pages_ref, (real_pages_ref, pages_ref)

    # mangle_ops also breaks the graph so the ladder descends past
    # strict AND lenient down to the raw string sieve (FIXTURES.md §1a)
    cat_pages = pages_ref if corrupt not in ("garbage_graph", "mangle_ops") else 9999
    catalog_ref = add(b"<< /Type /Catalog /Pages %d 0 R >>" % cat_pages)

    encrypt_ref = None
    if encrypted or needs_password:
        u = PDF_PAD if not needs_password else bytes(range(32))
        encrypt_ref = add(
            b"<< /Filter /Standard /V 1 /R 2 /O (%s) /U (%s) /P -44 >>"
            % (_esc_bytes(bytes(reversed(PDF_PAD))), _esc_bytes(u))
        )
    info_ref = None
    entries = dict(info or {})
    if producer is not None:
        entries = {"Producer": producer, **entries}
    if entries:
        body = b" ".join(
            b"/%s (%s)" % (k.encode("ascii"), _esc(v)) for k, v in entries.items()
        )
        info_ref = add(b"<< %s >>" % body)

    header = b"%PDF-1.4\n%\xc2\xb5\xc2\xb6\n"
    if corrupt == "no_magic":
        header = b"%NOT-A-PDF\n"

    out = bytearray(header)
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n%s\nendobj\n" % (i, body)

    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    enc = b" /Encrypt %d 0 R" % encrypt_ref if encrypt_ref else b""
    info = b" /Info %d 0 R" % info_ref if info_ref else b""
    out += (
        b"trailer\n<< /Size %d /Root %d 0 R%s%s >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, catalog_ref, enc, info, xref_at)
    )

    if corrupt == "truncate_xref":
        # cut inside the trailer AND break the catalog so the strict
        # object-graph walk fails, not just the xref read
        cut = bytes(out[: xref_at // 2])
        return cut.replace(b"/Type /Catalog", b"/Typ~ /Catalo~")
    return bytes(out)
