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
PypdfParser = _gated_parser("pypdf", "PypdfParser")
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
