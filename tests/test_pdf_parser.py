"""Pure-python PDF text extraction (xpacks/llm/_pdf.py) on hand-built
fixture PDFs — FlateDecode + literal/hex strings + Tj/TJ/quote ops."""

from __future__ import annotations

import zlib

import pandas as pd

import pathway_spark as pw
from pathway_spark.xpacks.llm import parsers
from pathway_spark.xpacks.llm._pdf import pdf_extract_text


def _make_pdf(content: bytes, compress: bool = True) -> bytes:
    body = zlib.compress(content) if compress else content
    filt = b" /Filter /FlateDecode" if compress else b""
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj",
        b"4 0 obj << /Length %d%s >> stream\n%s\nendstream endobj"
        % (len(body), filt, body),
    ]
    return b"%PDF-1.4\n" + b"\n".join(objs) + b"\n%%EOF\n"


def test_basic_tj_and_lines():
    pdf = _make_pdf(
        b"BT /F1 12 Tf 72 720 Td (Hello, World!) Tj 0 -14 Td "
        b"[(Sec) -20 (ond)] TJ ET")
    assert pdf_extract_text(pdf) == "Hello, World!\nSecond"


def test_uncompressed_hex_and_escapes():
    pdf = _make_pdf(
        b"BT <48656C6C6F> Tj T* (a\\)b\\\\c\\101) Tj T* "
        b"(multi\\nline) Tj ET", compress=False)
    # \) -> ), \\ -> \, \101 -> octal 'A'; \n escape inside the literal
    assert pdf_extract_text(pdf) == "Hello\na)b\\cA\nmulti\nline"


def test_quote_operators_and_noise_streams():
    content = b"BT (first) Tj (second) ' ET"
    # add a binary (non-text) stream that must be skipped
    noise = b"9 0 obj << /Length 4 >> stream\n\xde\xad\xbe\xef\nendstream endobj\n"
    pdf = _make_pdf(content) + noise
    assert pdf_extract_text(pdf) == "first\nsecond"


def test_garbage_inputs():
    assert pdf_extract_text(b"not a pdf") == ""
    assert pdf_extract_text(b"%PDF-1.4 truncated stream\n") == ""
    # corrupt deflate body is skipped, not fatal
    bad = _make_pdf(b"BT (x) Tj ET")
    bad = bad.replace(zlib.compress(b"BT (x) Tj ET"), b"\x00\x01\x02")
    assert pdf_extract_text(bad) == ""


def test_pypdf_parser_udf(spark):
    pdf = _make_pdf(b"BT (Spark   loves)Tj T* (  PDFs!) Tj ET")
    p = parsers.PypdfParser()
    t = pw.debug.table_from_pandas(pd.DataFrame({"data": [pdf]}))
    [row] = t.select(txt=p(t.data)).to_df().collect()
    # cleanup collapses whitespace runs per line
    assert row.txt == "Spark loves\nPDFs!"
