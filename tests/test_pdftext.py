"""PDF text extraction (north-rule "PDF/layout parse" path).

The PDFs are constructed by hand in the test — a valid minimal
document shape with one content stream — so the extractor is exercised
on FlateDecode and raw streams, Tj/TJ/quote operators, escapes, and
the Spark routing (tier='pdf')."""

import zlib

from trafilatura_spark.kernel import Options, bare_extract
from trafilatura_spark.kernel.pdftext import extract_pdf_text, is_pdf


def build_pdf(content: bytes, compress: bool = True) -> bytes:
    "Minimal single-page PDF embedding ``content`` as the page stream."
    if compress:
        body = zlib.compress(content)
        filt = b"/Filter /FlateDecode "
    else:
        body = content
        filt = b""
    return (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        b"4 0 obj << " + filt + b"/Length " + str(len(body)).encode() + b" >>\n"
        b"stream\n" + body + b"\nendstream\nendobj\n"
        b"trailer << /Root 1 0 R >>\n%%EOF\n"
    )


CONTENT = (
    b"BT /F1 12 Tf 72 720 Td (Hello PDF world.) Tj "
    b"0 -14 Td (Second line with \\(escaped\\) parens.) Tj "
    b"T* [(Kerned ) -120 (array ) -80 (text.)] TJ ET"
)


def test_is_pdf_magic():
    assert is_pdf(b"%PDF-1.7\n...") and is_pdf("%PDF-1.4 x")
    assert not is_pdf("<html></html>") and not is_pdf(None) and not is_pdf(b"PDF-")


def test_extract_flate_stream():
    text = extract_pdf_text(build_pdf(CONTENT, compress=True))
    assert "Hello PDF world." in text
    assert "Second line with (escaped) parens." in text
    assert "Kerned array text." in text
    # line-positioning operators produced line breaks
    assert text.index("Hello") < text.index("\n") < text.index("Kerned")


def test_extract_raw_stream_and_octal():
    content = b"BT (Caf\\351 costs \\0445) Tj ET"  # \351 = e-acute, \044 = $
    text = extract_pdf_text(build_pdf(content, compress=False))
    assert text == "Café costs $5"


def test_malformed_pdf_never_raises():
    assert extract_pdf_text(b"%PDF-1.4 garbage stream \x00\x01 endstream") == ""
    assert extract_pdf_text(b"%PDF-") == ""


def test_bare_extract_routes_pdf_payloads():
    res = bare_extract(build_pdf(CONTENT), Options(min_extracted_size=0))
    assert res.tier == "pdf"
    assert "Hello PDF world." in res.text
    empty = bare_extract(b"%PDF-1.4\n%%EOF\n", Options(min_extracted_size=0))
    assert empty.text is None and empty.tier == "pdf_empty"


def test_spark_operator_routes_pdf_strings():
    "String-typed text cells carrying PDF bytes reach the PDF reader."
    from trafilatura_spark.operators.extract import extract_one

    payload = build_pdf(CONTENT).decode("latin-1")
    text, tier, kept = extract_one(payload, Options(min_extracted_size=0))
    assert tier == "pdf" and "Hello PDF world." in text and kept == len(text)


def test_extract_facade_pdf_with_nontxt_format():
    "Non-txt formats degrade to plain text for PDFs (no DOM to serialize)."
    from trafilatura_spark.kernel import extract

    out = extract(build_pdf(CONTENT), Options(min_extracted_size=0, format="json"))
    assert out and "Hello PDF world." in out


def test_extract_transcripts_pdf_rows_end_to_end(spark):
    "A PDF turn flows through the mapInPandas cascade as tier='pdf'."
    from trafilatura_spark.operators.extract import extract_transcripts

    pdf_payload = build_pdf(CONTENT).decode("latin-1")
    html_payload = "<article><p>" + "plain html words " * 20 + "</p></article>"
    df = spark.createDataFrame(
        [("c1", 0, pdf_payload), ("c1", 1, html_payload)],
        "conv_id string, turn_idx int, text string",
    )
    rows = {r.turn_idx: r for r in extract_transcripts(df).collect()}
    assert rows[0].tier == "pdf" and "Hello PDF world." in rows[0].extracted_text
    assert rows[1].tier in ("main", "baseline") and "plain html words" in rows[1].extracted_text
