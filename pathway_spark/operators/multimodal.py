"""Multimodal (image/audio/video) columns: opaque `binary` + typed
metadata, with REAL pure-stdlib decoders for WAV (RIFF/PCM via `wave` +
numpy) and PNG (zlib inflate + scanline un-filtering, all color types of
bit depth 8) — no third-party codec libs needed. Video frame sampling
remains gated (no container parser in the stdlib).

Design (per build spec): media travel as `binary` columns; decode /
feature-extract runs in mapInPandas so each task streams Arrow batches
(bounded memory) and feature columns come back as plain integer/array
columns usable by the similarity and dedup operators.

At 100 TB: binaryFile sources give per-file parallelism; nothing here
shuffles — decode is a per-row projection inside one map stage.

Reference surface mirrored: python/pathway/xpacks/llm/parsers.py
(ImageParser / media parsing enter as binary-column UDF stages there
too; the decoding itself is delegated to external libs in the
reference, reimplemented here from the public WAV/PNG format specs).
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..table import ID, Table


class DecoderUnavailable(NotImplementedError):
    pass


MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("content", T.BinaryType()),
    T.StructField("media_type", T.StringType()),   # image|audio|video
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("codec", T.StringType()),
    ])),
])


def read_media_dir(spark, path: str, media_type: str = "image") -> Table:
    """binaryFile source -> media table (scales: one task per file split)."""
    df = (
        spark.read.format("binaryFile").load(path)
        .select(
            F.xxhash64("path").alias("media_id"),
            F.col("content"),
            F.lit(media_type).alias("media_type"),
            F.lit(None).cast(MEDIA_SCHEMA["meta"].dataType).alias("meta"),
        )
    )
    return Table(df.withColumn(ID, F.col("media_id")))


# --------------------------------------------------------------- WAV codec

_WAV_DTYPES = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}


def encode_wav(samples: np.ndarray, *, sample_rate: int,
               channels: int = 1, sampwidth: int = 2) -> bytes:
    """PCM WAV bytes from an int array (interleaved frames)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(sample_rate)
        w.writeframes(np.asarray(samples, dtype=_WAV_DTYPES[sampwidth]).tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int, int]:
    """(interleaved samples int array, sample_rate, channels) from RIFF
    PCM bytes — stdlib `wave` parses the container, numpy views PCM."""
    with wave.open(io.BytesIO(data)) as w:
        ch, sw, sr, nf = (w.getnchannels(), w.getsampwidth(),
                          w.getframerate(), w.getnframes())
        raw = w.readframes(nf)
    if sw not in _WAV_DTYPES:
        raise DecoderUnavailable(f"unsupported WAV sample width {sw}")
    arr = np.frombuffer(raw, dtype=_WAV_DTYPES[sw]).astype(np.int64)
    if sw == 1:                       # 8-bit WAV is unsigned, center it
        arr = arr - 128
    return arr, sr, ch


def wav_features(data: bytes) -> dict:
    """Integer audio features from real WAV decode: rate/channels/frames,
    duration, peak, sum|s|, energy Σs², zero crossings over the
    interleaved stream. All-integer so results are engine-exact."""
    s, sr, ch = decode_wav(data)
    n_frames = len(s) // max(ch, 1)
    zc = int(np.count_nonzero(s[1:] * s[:-1] < 0)) if len(s) > 1 else 0
    return {
        "sample_rate": sr,
        "channels": ch,
        "n_frames": n_frames,
        "duration_ms": n_frames * 1000 // sr if sr else 0,
        "peak": int(np.max(np.abs(s))) if len(s) else 0,
        "sum_abs": int(np.sum(np.abs(s))),
        "energy": int(np.sum(s * s)),
        "zero_crossings": zc,
    }


_WAV_FEATURE_FIELDS = [
    ("sample_rate", T.LongType()), ("channels", T.LongType()),
    ("n_frames", T.LongType()), ("duration_ms", T.LongType()),
    ("peak", T.LongType()), ("sum_abs", T.LongType()),
    ("energy", T.LongType()), ("zero_crossings", T.LongType()),
]


def extract_wav_features(table: Table, content_col: str = "content") -> Table:
    """Real WAV decode + integer feature columns via mapInPandas."""
    in_schema = table._df.schema
    out_schema = T.StructType(
        list(in_schema.fields)
        + [T.StructField(n, t) for n, t in _WAV_FEATURE_FIELDS]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            feats = [wav_features(bytes(b)) for b in pdf[content_col]]
            for name, _ in _WAV_FEATURE_FIELDS:
                pdf[name] = [f[name] for f in feats]
            yield pdf

    return Table(table._df.mapInPandas(run, out_schema))


# --------------------------------------------------------------- PNG codec

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}   # color type -> samples/px


def encode_png(pixels: np.ndarray) -> bytes:
    """PNG bytes from an (H, W) gray or (H, W, C) uint8 array (C∈{1,2,3,4});
    filter 0 scanlines + one zlib IDAT."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def _unfilter(ftype: int, line: np.ndarray, prev: np.ndarray,
              bpp: int) -> np.ndarray:
    """Reverse one PNG scanline filter (spec §6); uint8 wraparound math."""
    out = line.astype(np.int32)
    if ftype == 0:
        return line.copy()
    if ftype == 2:                                   # Up
        return ((out + prev) & 0xFF).astype(np.uint8)
    res = np.empty_like(line)
    for i in range(len(line)):
        a = int(res[i - bpp]) if i >= bpp else 0
        b = int(prev[i])
        if ftype == 1:                               # Sub
            v = line[i] + a
        elif ftype == 3:                             # Average
            v = line[i] + ((a + b) >> 1)
        else:                                        # Paeth
            c = int(prev[i - bpp]) if i >= bpp else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            v = line[i] + pred
        res[i] = v & 0xFF
    return res


def decode_png(data: bytes) -> np.ndarray:
    """(H, W, C) uint8 pixels from PNG bytes: chunk walk, zlib inflate,
    per-scanline un-filter. Bit depth 8, no interlace (the common case;
    others raise DecoderUnavailable)."""
    if data[:8] != _PNG_SIG:
        raise DecoderUnavailable("not a PNG")
    pos, idat, meta = 8, [], None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body)
            if depth != 8 or interlace != 0 or ctype not in _PNG_CHANNELS:
                raise DecoderUnavailable(
                    f"unsupported PNG (depth={depth} color={ctype} "
                    f"interlace={interlace})")
            meta = (w, h, _PNG_CHANNELS[ctype])
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if meta is None:
        raise DecoderUnavailable("PNG missing IHDR")
    w, h, c = meta
    raw = zlib.decompress(b"".join(idat))
    stride = w * c
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)], dtype=np.uint8)
        prev = _unfilter(ftype, line, prev, c)
        out[y] = prev
    return out.reshape(h, w, c)


def image_features(data: bytes) -> dict:
    """Integer image features from real PNG decode."""
    px = decode_png(data).astype(np.int64)
    h, w, c = px.shape
    return {
        "width": w, "height": h, "channels": c,
        "sum_px": int(px.sum()),
        "max_px": int(px.max()),
        "mean_px_u": int(px.sum() * 1000 // px.size),
    }


_IMG_FEATURE_FIELDS = [
    ("width", T.LongType()), ("height", T.LongType()),
    ("channels", T.LongType()), ("sum_px", T.LongType()),
    ("max_px", T.LongType()), ("mean_px_u", T.LongType()),
]


def extract_image_features(table: Table, content_col: str = "content") -> Table:
    """Real PNG decode + integer feature columns via mapInPandas."""
    in_schema = table._df.schema
    out_schema = T.StructType(
        list(in_schema.fields)
        + [T.StructField(n, t) for n, t in _IMG_FEATURE_FIELDS]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            feats = [image_features(bytes(b)) for b in pdf[content_col]]
            for name, _ in _IMG_FEATURE_FIELDS:
                pdf[name] = [f[name] for f in feats]
            yield pdf

    return Table(table._df.mapInPandas(run, out_schema))


def resize_images(table: Table, width: int, height: int,
                  content_col: str = "content") -> Table:
    """Nearest-neighbor resize on real decoded PNG pixels, re-encoded as
    PNG — decode/resize/encode all inside one mapInPandas stage."""
    in_schema = table._df.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()

            def rz(b):
                px = decode_png(bytes(b))
                h, w = px.shape[:2]
                yi = (np.arange(height) * h) // height
                xi = (np.arange(width) * w) // width
                return encode_png(px[yi][:, xi])

            pdf[content_col] = pdf[content_col].map(rz)
            yield pdf

    return Table(table._df.mapInPandas(run, in_schema))


# ----------------------------------------------------- generic feature UDF

def _fake_decode(content: bytes, dim: int) -> list[float]:
    """Deterministic stand-in decoder for media types with no stdlib
    codec (video): content-hash-seeded feature vector."""
    h = hashlib.sha256(content or b"").digest()
    return [((h[i % 32] * 31 + i) % 256) / 255.0 for i in range(dim)]


def extract_features(table: Table, *, dim: int = 64, real_decoder=None) -> Table:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    `real_decoder(bytes)->list[float]` plugs in an actual codec (e.g.
    `lambda b: decode_png(b).mean(axis=(0,1)).tolist()`); default is the
    deterministic fake for codec-less media types."""
    decoder = real_decoder or (lambda b: _fake_decode(b, dim))
    in_schema = table._df.schema
    out_schema = T.StructType(list(in_schema.fields) + [
        T.StructField("features", T.ArrayType(T.DoubleType()))
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["features"] = pdf["content"].map(
                lambda b: decoder(bytes(b) if b is not None else b""))
            yield pdf

    return Table(table._df.mapInPandas(run, out_schema))


def encode_y4m(frames: np.ndarray, *, fps_num: int = 25,
               fps_den: int = 1) -> bytes:
    """YUV4MPEG2 bytes from (N, H, W) uint8 gray frames (Cmono)."""
    n, h, w = frames.shape
    head = f"YUV4MPEG2 W{w} H{h} F{fps_num}:{fps_den} Ip A1:1 Cmono\n"
    out = [head.encode()]
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(frames[i].astype(np.uint8).tobytes())
    return b"".join(out)


def decode_y4m(data: bytes):
    """Parse YUV4MPEG2 (the one video container with a pure-bytes spec —
    plain-text header + raw planar frames). Yields (frame_index,
    timestamp_ms, (H, W) uint8 Y-plane). Supports mono and the 4:2:0 /
    4:2:2 / 4:4:4 chroma layouts (chroma is skipped; features and
    sampling work on luma)."""
    if not data.startswith(b"YUV4MPEG2") or b"\n" not in data:
        raise DecoderUnavailable("not a YUV4MPEG2 stream")
    nl = data.index(b"\n")
    header = data[:nl].decode("ascii", "replace")
    w = h = 0
    num, den = 25, 1
    chroma = "420"
    for tok in header.split()[1:]:
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "F":
            num, den = (int(x) for x in tok[1:].split(":"))
        elif tok[0] == "C":
            chroma = tok[1:]
    if not w or not h:
        raise DecoderUnavailable("y4m header missing W/H")
    ysize = w * h
    if chroma.startswith("mono"):
        fsize = ysize
    elif chroma.startswith("420"):
        fsize = ysize + ysize // 2
    elif chroma.startswith("422"):
        fsize = ysize * 2
    elif chroma.startswith("444"):
        fsize = ysize * 3
    else:
        raise DecoderUnavailable(f"unsupported y4m chroma {chroma!r}")
    pos = nl + 1
    idx = 0
    frame_ms = 1000.0 * den / num
    while pos < len(data):
        fnl = data.index(b"\n", pos)
        if not data[pos:fnl].startswith(b"FRAME"):
            raise DecoderUnavailable("malformed y4m FRAME marker")
        pos = fnl + 1
        y = np.frombuffer(data[pos:pos + ysize], dtype=np.uint8).reshape(h, w)
        yield idx, int(idx * frame_ms), y
        pos += fsize
        idx += 1


def sample_frames(table: Table, every_ms: int,
                  content_col: str = "content") -> Table:
    """Video frame sampling over Y4M streams — one output row per
    sampled frame, frame re-encoded as PNG (both codecs pure-stdlib, so
    the whole decode→sample→encode pipeline runs inside mapInPandas
    with no native deps). Compressed containers (mp4/webm) need a codec
    library; plug a decoder with the same yield contract into
    `decoder=`.

    Scale: rows explode by duration/every_ms; each input video decodes
    exactly once per partition pass, frames never leave the executor
    un-encoded. Reference: xpacks/llm/parsers.py video paths.
    """
    in_schema = table._df.schema
    keep = [f for f in in_schema.fields if f.name != content_col]
    out_schema = T.StructType(keep + [
        T.StructField("frame_index", T.LongType()),
        T.StructField("frame_ms", T.LongType()),
        T.StructField("frame_png", T.BinaryType()),
    ])
    keep_names = [f.name for f in keep]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {n: [] for n in keep_names}
            fidx, fms, fpng = [], [], []
            for _, row in pdf.iterrows():
                data = bytes(row[content_col] or b"")
                next_ms = 0
                for idx, ts_ms, y in decode_y4m(data):
                    if ts_ms >= next_ms:
                        next_ms = ts_ms + every_ms
                        for n in keep_names:
                            rows[n].append(row[n])
                        fidx.append(idx)
                        fms.append(ts_ms)
                        fpng.append(encode_png(y))
            out = pd.DataFrame(rows)
            out["frame_index"] = pd.Series(fidx, dtype="int64")
            out["frame_ms"] = pd.Series(fms, dtype="int64")
            out["frame_png"] = fpng
            yield out

    return Table(table._df.mapInPandas(run, out_schema))
