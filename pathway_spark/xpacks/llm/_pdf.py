"""Pure-python PDF text extraction — the no-dependency fallback behind
``PypdfParser`` (reference python/pathway/xpacks/llm/parsers.py wraps the
pypdf package; this container has no pypdf, so DocumentStore ingestion
of text-first PDFs gets a stdlib path).

Scope: uncompressed or FlateDecode content streams, literal/hex strings,
the text-showing operators Tj ' " TJ and line-advance operators Td TD T*.
CID/Type0 2-byte encodings and ToUnicode CMaps are out of scope — bytes
are decoded as Latin-1, which covers the overwhelmingly common WinAnsi/
StandardEncoding text PDFs. Completely malformed input yields "".
"""

from __future__ import annotations

import re
import zlib

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n", re.S)

# PDF literal-string escapes (ISO 32000-1 §7.3.4.2)
_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _streams(data: bytes):
    """Yield (dict_bytes, decoded_stream) for every stream object,
    inflating FlateDecode bodies; undecodable streams are skipped."""
    pos = 0
    while True:
        m = _STREAM_RE.search(data, pos)
        if not m:
            return
        body_start = m.end()
        end = data.find(b"endstream", body_start)
        if end < 0:
            return
        pos = end + len(b"endstream")
        body = data[body_start:end]
        if body.endswith(b"\n"):
            body = body[:-1]
        if body.endswith(b"\r"):
            body = body[:-1]
        d = m.group(1)
        if b"FlateDecode" in d:
            try:
                # decompressobj tolerates trailing garbage after the
                # deflate payload (common with sloppy Length entries)
                body = zlib.decompressobj().decompress(body)
            except zlib.error:
                continue
        yield d, body


def _parse_literal(content: bytes, i: int) -> tuple[bytes, int]:
    """Parse a ``(...)`` literal starting at i (at the '('); returns
    (string bytes, index past the closing ')')."""
    out, depth, i = bytearray(), 1, i + 1
    n = len(content)
    while i < n and depth:
        c = content[i:i + 1]
        if c == b"\\":
            nxt = content[i + 1:i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
            elif nxt.isdigit():  # \ddd octal, 1-3 digits
                j = i + 1
                while j < min(i + 4, n) and content[j:j + 1].isdigit():
                    j += 1
                out.append(int(content[i + 1:j], 8) & 0xFF)
                i = j
            elif nxt in (b"\n", b"\r"):  # line continuation
                i += 2
                if nxt == b"\r" and content[i:i + 1] == b"\n":
                    i += 1
            else:
                out += nxt
                i += 2
        elif c == b"(":
            depth += 1
            out += c
            i += 1
        elif c == b")":
            depth -= 1
            if depth:
                out += c
            i += 1
        else:
            out += c
            i += 1
    return bytes(out), i


def _parse_hex(content: bytes, i: int) -> tuple[bytes, int]:
    end = content.find(b">", i)
    if end < 0:
        return b"", len(content)
    hx = re.sub(rb"\s", b"", content[i + 1:end])
    if len(hx) % 2:
        hx += b"0"  # odd final digit implies trailing 0 (spec)
    try:
        return bytes.fromhex(hx.decode("ascii")), end + 1
    except ValueError:
        return b"", end + 1


_TOKEN_RE = re.compile(rb"[A-Za-z'\"*]+|\[|\]|\(|<[^<]|[-+.0-9]+")


def _extract_stream_text(content: bytes) -> list[str]:
    """Run the text-operator machine over one content stream."""
    lines: list[str] = []
    cur: list[bytes] = []
    pending: list[bytes] = []  # strings seen since the last operator
    i, n = 0, len(content)

    def flush_line():
        if cur:
            lines.append(b"".join(cur).decode("latin-1"))
            cur.clear()

    while i < n:
        c = content[i:i + 1]
        if c == b"(":
            s, i = _parse_literal(content, i)
            pending.append(s)
        elif c == b"<" and content[i + 1:i + 2] != b"<":
            s, i = _parse_hex(content, i)
            pending.append(s)
        elif c == b"<":  # dict <<
            i += 2
        elif c.isalpha() or c in (b"'", b'"', b"*"):
            m = re.match(rb"[A-Za-z'\"*]+", content[i:])
            op = m.group(0)
            i += len(op)
            if op == b"Tj":
                cur.extend(pending)
            elif op == b"TJ":
                cur.extend(pending)
            elif op in (b"'", b'"'):  # next-line-and-show
                flush_line()
                cur.extend(pending)
            elif op in (b"Td", b"TD", b"T*"):
                flush_line()
            elif op == b"ET":
                flush_line()
            pending.clear()
        else:
            i += 1
    flush_line()
    return lines


def pdf_extract_text(data: bytes) -> str:
    """Extract text from a PDF's content streams, page order as the
    streams appear in the file; '' when nothing decodable."""
    if not data.startswith(b"%PDF"):
        return ""
    lines: list[str] = []
    for _d, body in _streams(data):
        # content streams contain BT/ET text blocks; skip fonts/images
        if b"BT" not in body:
            continue
        lines.extend(_extract_stream_text(body))
    return "\n".join(line for line in lines if line)
