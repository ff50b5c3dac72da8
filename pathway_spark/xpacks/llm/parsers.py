"""Parsers — reference `python/pathway/xpacks/llm/parsers.py`.

A parser is a `pw.UDF`: `binary → str` (extracted text). `Utf8Parser` is
fully functional; format-specific parsers (unstructured/docling/pypdf/
OCR/audio) are gated on their libraries, which aren't in this container —
the UDF signature, batch shape, and Spark-side plumbing are real (same
contract as `operators/multimodal.py` decoders).
"""

from __future__ import annotations

from ...udfs import UDF


class Utf8Parser(UDF):
    """reference parsers.py:55 — decode binary to utf-8 text."""

    def __init__(self, **kw):
        def parse(contents: bytes) -> str:
            if isinstance(contents, str):
                return contents
            return bytes(contents).decode("utf-8", errors="replace")

        super().__init__(parse, return_type=str, **kw)


ParseUtf8 = Utf8Parser  # deprecated alias kept by the reference


def _gated_parser(pkg: str, cls: str, note: str = ""):
    class _Gated(UDF):
        def __init__(self, *args, **kw):
            raise ImportError(
                f"{cls} requires the `{pkg}` package (not in this container)."
                f"{note} Utf8Parser covers plain text; the binary-column "
                f"plumbing it would run on is tested in operators/multimodal."
            )

    _Gated.__name__ = cls
    return _Gated


UnstructuredParser = _gated_parser("unstructured", "UnstructuredParser")
ParseUnstructured = UnstructuredParser
DoclingParser = _gated_parser("docling", "DoclingParser")


class PypdfParser(UDF):
    """reference parsers.py PypdfParser — binary PDF → extracted text.
    Uses the pypdf package when installed; otherwise falls back to the
    pure-stdlib extractor in `_pdf.py` (FlateDecode + Tj/TJ operators),
    so text-first PDF ingestion works with zero optional deps."""

    def __init__(self, apply_text_cleanup: bool = True, **kw):
        try:
            import pypdf  # noqa: F401

            def parse(contents: bytes) -> str:
                import io as _io

                import pypdf as _p
                reader = _p.PdfReader(_io.BytesIO(bytes(contents)))
                text = "\n".join(p.extract_text() or "" for p in reader.pages)
                return _cleanup(text) if apply_text_cleanup else text
        except ImportError:
            from ._pdf import pdf_extract_text

            def parse(contents: bytes) -> str:
                text = pdf_extract_text(bytes(contents))
                return _cleanup(text) if apply_text_cleanup else text

        super().__init__(parse, return_type=str, **kw)


def _cleanup(text: str) -> str:
    """reference parsers.py pypdf cleanup: collapse intra-line runs of
    whitespace, drop empty lines."""
    lines = (" ".join(ln.split()) for ln in text.splitlines())
    return "\n".join(ln for ln in lines if ln)
ImageParser = _gated_parser("PIL", "ImageParser",
                            " (vision-LLM description of images)")
SlideParser = _gated_parser("pdf2image", "SlideParser")
PaddleOCRParser = _gated_parser("paddleocr", "PaddleOCRParser")
AudioParser = _gated_parser("pydub", "AudioParser")


__all__ = [
    "Utf8Parser", "ParseUtf8", "UnstructuredParser", "ParseUnstructured",
    "DoclingParser", "PypdfParser", "ImageParser", "SlideParser",
    "PaddleOCRParser", "AudioParser",
]
