"""PDF layout parse (north rule: 'PDF/layout parse'): object lexer,
page-tree walk, content-stream text state machine, image XObject
placement, geometry ordering, FlateDecode, and tolerant parsing.

The hand-built fixtures below are written byte-by-byte from the public
PDF 1.7 spec (ISO 32000) — NOT via this repo's own writer — so the
parser is pinned to the spec, not to its sibling."""

from __future__ import annotations

import zlib

import pytest

from ocr_inference_spark.text.pdf_extract import (
    pdf_extract_spans,
    pdf_write,
    synth_pdf_for,
)


def _pdf(objects: list[bytes], root: int) -> bytes:
    """Assemble numbered objects + trailer (no xref — exercises the
    scan fallback every real-world repair parser needs)."""
    out = bytearray(b"%PDF-1.4\n")
    for i, body in enumerate(objects, start=1):
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    out += f"trailer\n<< /Size {len(objects)+1} /Root {root} 0 R >>\n%%EOF".encode()
    return bytes(out)


def _one_page(content: bytes, extra_res: bytes = b"") -> bytes:
    return _pdf(
        [
            b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>",
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << " + extra_res + b" >> /Contents 4 0 R >>",
            b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
            + content + b"\nendstream",
        ],
        root=1,
    )


# ----------------------------------------------------------- text operators


def test_tj_and_td():
    spans = pdf_extract_spans(
        _one_page(b"BT /F1 12 Tf 72 700 Td (hello world) Tj ET")
    )
    assert spans == [("text", "hello world", None)]


def test_tj_array_with_kerning():
    spans = pdf_extract_spans(
        _one_page(b"BT 72 700 Td [(he) -120 (llo) 40 ( there)] TJ ET")
    )
    assert spans == [("text", "hello there", None)]


def test_tstar_and_quote_advance_lines():
    content = (
        b"BT 2 TL 72 700 Td (first) Tj T* (second) Tj (third) ' ET"
    )
    spans = pdf_extract_spans(_one_page(content))
    assert [s[1] for s in spans] == ["first", "second", "third"]


def test_tm_positioning_and_geometry_sort():
    # emitted bottom-first in the stream; geometry must reorder
    content = (
        b"BT 1 0 0 1 72 100 Tm (bottom) Tj ET "
        b"BT 1 0 0 1 72 700 Tm (top) Tj ET "
        b"BT 1 0 0 1 300 700 Tm (right) Tj ET"
    )
    spans = pdf_extract_spans(_one_page(content))
    assert [s[1] for s in spans] == ["top", "right", "bottom"]


def test_string_escapes_and_hex():
    content = (
        rb"BT 72 700 Td (par\(en\) back\\slash \110i octal\056) Tj "
        rb"0 -40 Td <48454C4C4F> Tj ET"
    )
    spans = pdf_extract_spans(_one_page(content))
    assert spans == [
        ("text", "par(en) back\\slash Hi octal.", None),
        ("text", "HELLO", None),
    ]


def test_text_outside_bt_et_is_ignored():
    spans = pdf_extract_spans(_one_page(b"(loose) Tj BT 72 700 Td (kept) Tj ET"))
    assert spans == [("text", "kept", None)]


# ----------------------------------------------------------- images + pages


def test_image_xobject_placement():
    res = (
        b"/XObject << /Im1 5 0 R >>"
    )
    content = (
        b"BT 72 700 Td (above) Tj ET "
        b"q 64 0 0 64 72 600 cm /Im1 Do Q "
        b"BT 72 500 Td (below) Tj ET"
    )
    blob = _pdf(
        [
            b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>",
            b"<< /Type /Page /Parent 2 0 R /Resources << " + res + b" >> "
            b"/Contents 4 0 R >>",
            b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
            + content + b"\nendstream",
            b"<< /Type /XObject /Subtype /Image /Width 1 /Height 1 "
            b"/BitsPerComponent 8 /ColorSpace /DeviceGray /Length 1 >>\n"
            b"stream\n\xff\nendstream",
        ],
        root=1,
    )
    assert pdf_extract_spans(blob) == [
        ("text", "above", None),
        ("media", None, "Im1"),
        ("text", "below", None),
    ]


def test_non_image_xobject_do_is_ignored():
    res = b"/XObject << /Fm1 5 0 R >>"
    content = b"/Fm1 Do BT 72 700 Td (t) Tj ET"
    blob = _pdf(
        [
            b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>",
            b"<< /Type /Page /Parent 2 0 R /Resources << " + res + b" >> "
            b"/Contents 4 0 R >>",
            b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
            + content + b"\nendstream",
            b"<< /Type /XObject /Subtype /Form /BBox [0 0 1 1] /Length 0 >>\n"
            b"stream\n\nendstream",
        ],
        root=1,
    )
    assert pdf_extract_spans(blob) == [("text", "t", None)]


def test_multi_page_tree_order():
    c1, c2 = b"BT 72 700 Td (page one) Tj ET", b"BT 72 700 Td (page two) Tj ET"
    blob = _pdf(
        [
            b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [ 3 0 R 5 0 R ] /Count 2 >>",
            b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
            b"<< /Length " + str(len(c1)).encode() + b" >>\nstream\n" + c1
            + b"\nendstream",
            b"<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>",
            b"<< /Length " + str(len(c2)).encode() + b" >>\nstream\n" + c2
            + b"\nendstream",
        ],
        root=1,
    )
    assert [s[1] for s in pdf_extract_spans(blob)] == ["page one", "page two"]


def test_flate_stream():
    content = b"BT 72 700 Td (squeezed) Tj ET"
    z = zlib.compress(content)
    blob = _pdf(
        [
            b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>",
            b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
            b"<< /Length " + str(len(z)).encode() + b" /Filter /FlateDecode >>"
            b"\nstream\n" + z + b"\nendstream",
        ],
        root=1,
    )
    assert pdf_extract_spans(blob) == [("text", "squeezed", None)]


def test_trailerless_catalog_fallback():
    content = b"BT 72 700 Td (found me) Tj ET"
    blob = _one_page(content)
    blob = blob[: blob.rfind(b"trailer")]  # strip trailer entirely
    assert pdf_extract_spans(blob) == [("text", "found me", None)]


# ----------------------------------------------------------- writer parity


def test_writer_roundtrip_with_xref_and_compression():
    for compress in (False, True):
        blob = pdf_write(
            [[("text", "alpha", 72, 700), ("image", "Pic", 72, 600),
              ("text", "omega", 72, 500)]],
            compress=compress,
        )
        assert blob.startswith(b"%PDF-") and b"startxref" in blob
        assert pdf_extract_spans(blob) == [
            ("text", "alpha", None),
            ("media", None, "Pic"),
            ("text", "omega", None),
        ]


def test_synth_corpus_rotation_is_reordered_by_geometry():
    text = "alpha beta gamma " * 16
    for did in range(12):
        blob = synth_pdf_for(did, text)
        spans = pdf_extract_spans(blob)
        from ocr_inference_spark.text.html_extract import _spec_of, paragraphs_for

        n, img = _spec_of(did)
        paras = paragraphs_for(did, text)
        exp = [("text", paras[0], None)]
        if img:
            exp.append(("media", None, f"img_{did:08d}_00"))
        exp += [("text", p, None) for p in paras[1:]]
        assert spans == exp, did


# ----------------------------------------------------------- fuzz guards


@pytest.mark.parametrize(
    "blob",
    [
        b"",
        b"not a pdf",
        b"%PDF-1.4\ngarbage",
        b"%PDF-1.4\n1 0 obj << /Type /Catalog >> endobj",  # no pages
    ],
)
def test_malformed_raises_cleanly(blob):
    with pytest.raises(ValueError):
        pdf_extract_spans(blob)


def test_truncated_mid_stream_is_tolerant():
    blob = pdf_write([[("text", "will survive", 72, 700)]])
    # truncating INSIDE the trailing xref must not break extraction
    assert pdf_extract_spans(blob[: blob.rfind(b"xref")]) == [
        ("text", "will survive", None)
    ]


def test_reference_cycle_guard():
    blob = _pdf(
        [
            b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>",
            b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
            b"4 0 R",  # object that references itself
        ],
        root=1,
    )
    with pytest.raises(ValueError, match="cycle"):
        pdf_extract_spans(blob)


# ----------------------------------------------------------- spark path


def test_spark_pdf_spans(spark):
    from ocr_inference_spark.io import read_table
    from ocr_inference_spark.text.pdf_extract import (
        pdf_extract_spans_df,
        synth_pdf_corpus,
    )

    docs = read_table(spark, "/root/testdata/sf0.001/documents.parquet")
    corpus = synth_pdf_corpus(spark, docs, n_docs=10)
    rows = pdf_extract_spans_df(corpus).collect()
    by_doc: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r["doc_id"], r["offset"])):
        by_doc.setdefault(r["doc_id"], []).append(
            (r["kind"], r["text"], r["media_ref"])
        )
    src = {str(r["doc_id"]): r["pdf"] for r in corpus.collect()}
    assert set(by_doc) == set(src)
    for doc_id, spans in by_doc.items():
        assert spans == pdf_extract_spans(bytes(src[doc_id]))


# ------------------------------------------------- embedded image payloads


def test_embedded_image_payloads_roundtrip():
    import numpy as np

    from ocr_inference_spark.text.pdf_extract import pdf_extract_media

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (40, 56), dtype=np.uint8)
    blob = pdf_write(
        [[("text", "caption", 72, 700), ("image", "Scan0", 72, 600, (img, "flate"))]]
    )
    media = pdf_extract_media(blob)
    assert set(media) == {"Scan0"}
    assert np.array_equal(media["Scan0"], img)  # FlateDecode is bit-exact
    # DCTDecode: decoded through jpegcodec, q95 error bounded
    blob2 = pdf_write([[("image", "ScanJ", 72, 600, (img, "dct"))]])
    out = pdf_extract_media(blob2)["ScanJ"]
    assert out.shape == img.shape
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) < 24


def test_xref_loader_survives_obj_pattern_inside_stream():
    """A binary stream containing the bytes '2 0 obj' must not shadow
    the real object 2 — the xref path keys off the table offsets."""
    import numpy as np

    from ocr_inference_spark.text.pdf_extract import pdf_extract_media

    # craft a payload whose compressed bytes contain b"2 0 obj"
    img = np.frombuffer((b"2 0 obj << /Trap 1 >> " * 40)[:800], np.uint8).reshape(
        20, 40
    )
    blob = pdf_write([[("text", "real text", 72, 700),
                       ("image", "P", 72, 600, (img, "flate"))]])
    assert b"startxref" in blob
    assert pdf_extract_spans(blob) == [
        ("text", "real text", None),
        ("media", None, "P"),
    ]
    assert np.array_equal(pdf_extract_media(blob)["P"], img)


def test_scanned_book_pdf_feeds_ocr():
    """Whole-container workflow: the PDF's embedded page image OCRs to
    the exact golden lines (the q47 invariant, single-doc form)."""
    import numpy as np

    from ocr_inference_spark.imgcodec import png_encode
    from ocr_inference_spark.model import RecognitionSession, serialize_weights
    from ocr_inference_spark.page import process_page
    from ocr_inference_spark.synth import page_lines_for
    from ocr_inference_spark.text.pdf_extract import (
        pdf_extract_media,
        synth_pdf_for,
    )

    text = "spark native analytics over interleaved documents " * 6
    for doc_id in (2, 7):  # flate and dct parities; both have has_img
        from ocr_inference_spark.text.html_extract import _spec_of

        if not _spec_of(doc_id)[1]:
            continue
        media = pdf_extract_media(synth_pdf_for(doc_id, text))
        (arr,) = media.values()
        res = process_page(png_encode(arr), RecognitionSession(serialize_weights()))
        assert res.status == "success"
        assert res.texts == page_lines_for(text, 3)
