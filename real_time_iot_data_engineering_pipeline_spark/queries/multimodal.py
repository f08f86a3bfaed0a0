"""Beyond-reference multimodal columns: opaque binary payloads with typed
metadata, processed by Arrow-batched Pandas functions over mapInPandas.

The pattern a 100 TB training-data pipeline needs: media lives as a `binary`
column (or object-store pointers) beside typed metadata; decode / feature-
extract / resize / frame-sample run as `mapInPandas` stages so each Arrow
batch crosses the JVM<->Python boundary once and the work distributes with
the partitioning.  Container-metadata decode is REAL for every format
(PNG/JPEG/WAV/MP4 header walks), and PAYLOAD decode is real wherever the
stdlib carries the codec: full integer-PCM WAV sample decode
(decode_wav_pcm) and full PNG pixel decode (decode_png_pixels — DEFLATE
is zlib, the filters are pure arithmetic).  Only DCT/video-codec frame
decode needs a stack absent from this container, so the single
NotImplementedError seam is `decode_video_frames`.  The registered
queries use `fake_decode_features` — a deterministic stand-in with the same
signature and schema — because fixture payloads are utf8 text, keeping ALL
the Spark-side plumbing (binary schema, Arrow batch shape, column
contracts, partition behavior) real, tested and oracle-checked.

The payloads here are derived from documents.text (cast to utf8 bytes) so
the DuckDB oracle can re-derive byte-identical inputs; every emitted feature
is a pure function of the bytes, which makes even the Python-side stage
fully oracle-checked.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import register
from ..sources import load_table

CONTENT_TYPES = ("image/png", "audio/wav", "video/mp4")

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("sha256_hex", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
    ]
)


def decode_media(payload: bytes, content_type: str) -> tuple[int, int, int]:
    """REAL media decode for the container-formats a pure-Python header
    parse can handle, returning (width, height, n_frames):

      - image/png  -> (pixel width, pixel height, 1) from the IHDR chunk
      - image/jpeg -> (pixel width, pixel height, 1) from the first SOFn
                      marker segment (baseline + progressive DCT)
      - audio/wav  -> (sample rate, channel count, audio-frame count) from
                      the RIFF fmt/data chunks — audio frames fill the
                      n_frames slot, channels stand in for height

      - video/mp4  -> (pixel width, pixel height, sample count) from the
                      moov box walk: tkhd 16.16 fixed-point dimensions of
                      the video track, stsz sample count (decode_mp4_metadata
                      also surfaces the ftyp brand and mvhd
                      duration/timescale)

    Payload-level decode is also real where the stdlib carries the codec:
    decode_wav_pcm unpacks the 8/16/32-bit integer-PCM samples
    (extract_audio_stats_real feeds them through mapInPandas) and
    decode_png_pixels inflates + unfilters the full PNG pixel data
    (extract_image_stats_real).  Only entropy-coded image/video payloads
    (JPEG DCT, video codecs) still need an external stack (PIL/ffmpeg,
    not in this container), so the NotImplementedError seam is exactly
    decode_video_frames — every container format's METADATA decode is real
    and exercised with genuine bytes (tests/test_golden.py feeds a real
    PNG, JPEG, WAV and MP4 through mapInPandas via extract_features_real)."""
    if content_type == "image/png":
        return _decode_png_header(payload)
    if content_type == "image/jpeg":
        return _decode_jpeg_header(payload)
    if content_type == "audio/wav":
        return _decode_wav_header(payload)
    if content_type == "video/mp4":
        meta = decode_mp4_metadata(payload)
        return (meta["width"], meta["height"], meta["n_samples"])
    raise NotImplementedError(
        f"no decoder for {content_type}; extend decode_media"
    )


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _decode_png_header(payload: bytes) -> tuple[int, int, int]:
    """Width/height from the IHDR chunk (PNG spec: IHDR is always first,
    at byte 8, with big-endian u32 dims)."""
    if not payload.startswith(_PNG_SIG) or len(payload) < 24:
        raise ValueError("not a PNG: bad signature")
    _length, ctype = struct.unpack(">I4s", payload[8:16])
    if ctype != b"IHDR":
        raise ValueError("not a PNG: first chunk is not IHDR")
    width, height = struct.unpack(">II", payload[16:24])
    return (width, height, 1)


# Channel count per PNG color type (spec §11.2.2); palette rows expand to
# RGB at sample-decode time.
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_PNG_VALID_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png_pixels(
    payload: bytes,
) -> tuple[int, int, int, int, list[list[int]]]:
    """FULL PNG pixel decode with the stdlib alone — PNG's only codec is
    DEFLATE, which is `zlib` (PNG spec / RFC 2083): concatenate the IDAT
    stream, inflate, reverse the per-scanline filter (all five types —
    None/Sub/Up/Average/Paeth, byte-wise with the spec's bpp offset),
    unpack 1/2/4/8/16-bit samples (MSB-first within a byte), and expand
    palette indices through PLTE.  Returns (width, height, channels,
    bit_depth, rows) where rows[y] is the row's interleaved per-channel
    sample values (palette rows expand to RGB, so channels is 3 for
    color type 3).  Non-interlaced only: Adam7 raises ValueError (it is
    a deinterlacing pass, not a codec, but no fixture needs it).  This
    removes PNG from the codec seam — decode_video_frames is now the
    repo's only NotImplementedError."""
    import zlib

    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = bit_depth = color_type = None
    interlace = 0
    plte = None
    idat: list[bytes] = []
    while pos + 8 <= len(payload):
        length, ctype = struct.unpack(">I4s", payload[pos : pos + 8])
        body = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            (
                width,
                height,
                bit_depth,
                color_type,
                comp,
                filt,
                interlace,
            ) = struct.unpack(">IIBBBBB", body)
            if comp or filt:
                raise ValueError("bad PNG: unknown compression/filter method")
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + body + crc
    if width is None or not idat:
        raise ValueError("bad PNG: missing IHDR/IDAT")
    if interlace:
        raise ValueError("Adam7-interlaced PNG not supported")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"bad PNG: color type {color_type}")
    if bit_depth not in _PNG_VALID_DEPTHS[color_type]:
        raise ValueError(
            f"bad PNG: depth {bit_depth} invalid for color type {color_type}"
        )
    nch = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(b"".join(idat))
    bits_per_px = nch * bit_depth
    stride = (width * bits_per_px + 7) // 8
    bpp = max(1, bits_per_px // 8)
    if len(raw) != (stride + 1) * height:
        raise ValueError("bad PNG: scanline data size mismatch")
    prev = bytearray(stride)
    rows: list[list[int]] = []
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if f == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif f != 0:
            raise ValueError(f"bad PNG: filter type {f}")
        prev = line
        n_samples = width * nch
        if bit_depth == 8:
            vals = list(line[:n_samples])
        elif bit_depth == 16:
            vals = [
                (line[2 * i] << 8) | line[2 * i + 1] for i in range(n_samples)
            ]
        else:  # 1/2/4-bit packed, MSB first
            per = 8 // bit_depth
            mask = (1 << bit_depth) - 1
            vals = [
                (line[i // per] >> (8 - bit_depth * ((i % per) + 1))) & mask
                for i in range(n_samples)
            ]
        if color_type == 3:
            if plte is None:
                raise ValueError("bad PNG: palette image missing PLTE")
            vals = [
                plte[3 * v + k] for v in vals for k in range(3)
            ]
        rows.append(vals)
    return width, height, (3 if color_type == 3 else nch), bit_depth, rows


IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("channels", T.LongType()),
        T.StructField("bit_depth", T.LongType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("peak", T.LongType()),
        T.StructField("mean", T.DoubleType()),
        T.StructField("pixel_sha256", T.StringType()),
    ]
)


def extract_image_stats_real(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas body over REAL PNG payloads: decodes every pixel
    (decode_png_pixels) and emits per-image sample stats plus a content
    hash of the decoded samples — the image twin of
    extract_audio_stats_real (brightness/blank-image filters, exact-dup
    detection on DECODED pixels rather than encoded bytes, which
    re-compression would defeat).  Partition-local, one Arrow crossing
    per batch."""
    for pdf in batches:
        out: dict[str, list] = {f.name: [] for f in IMAGE_STATS_SCHEMA}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            w, h, nch, depth, rows = decode_png_pixels(bytes(payload))
            flat = [v for row in rows for v in row]
            digest = hashlib.sha256()
            wordsize = 2 if depth == 16 else 1
            for row in rows:
                digest.update(
                    b"".join(v.to_bytes(wordsize, "big") for v in row)
                )
            out["doc_id"].append(doc_id)
            out["width"].append(w)
            out["height"].append(h)
            out["channels"].append(nch)
            out["bit_depth"].append(depth)
            out["n_pixels"].append(w * h)
            out["peak"].append(max(flat, default=0))
            out["mean"].append(sum(flat) / len(flat) if flat else 0.0)
            out["pixel_sha256"].append(digest.hexdigest())
        yield pd.DataFrame(out)


_JPEG_SOF_MARKERS = frozenset(
    range(0xC0, 0xD0)
) - {0xC4, 0xC8, 0xCC}  # SOFn minus DHT / JPG-extension / DAC


def _decode_jpeg_header(payload: bytes) -> tuple[int, int, int]:
    """Width/height from the first SOFn segment (baseline/progressive DCT
    alike): walk the FF-marker segment list from SOI; every non-SOI segment
    carries a big-endian u16 length, and SOFn's body is
    [precision u8, height u16, width u16, ...] (ITU T.81 B.2.2)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI marker")
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("not a JPEG: marker desync")
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if 0xD0 <= marker <= 0xD9:  # RSTn/SOI/EOI: no length field
            pos += 2
            continue
        (seg_len,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        if marker in _JPEG_SOF_MARKERS:
            if pos + 9 > len(payload):
                raise ValueError("not a JPEG: truncated SOF segment")
            height, width = struct.unpack(">HH", payload[pos + 5 : pos + 9])
            return (width, height, 1)
        if marker == 0xDA:  # SOS: entropy-coded data follows, no SOF seen
            break
        pos += 2 + seg_len
    raise ValueError("not a JPEG: no SOF marker before SOS/EOF")


def decode_wav_pcm(payload: bytes) -> tuple[int, int, list[int]]:
    """PCM sample decode (the payload-level step beyond the RIFF header):
    returns (sample_rate, channels, interleaved integer samples) for the
    8/16/32-bit integer-PCM WAVs the `wave` stdlib writes — pure Python +
    struct, no codec stack.  Float/compressed formats raise ValueError."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    fmt_tag = channels = rate = bits = None
    data = None
    pos = 12
    while pos + 8 <= len(payload):
        cid, csize = struct.unpack("<4sI", payload[pos : pos + 8])
        body = payload[pos + 8 : pos + 8 + csize]
        if cid == b"fmt " and csize >= 16:
            fmt_tag, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
        elif cid == b"data":
            data = body
        pos += 8 + csize + (csize & 1)
    if None in (fmt_tag, channels, rate, bits) or data is None:
        raise ValueError("not a WAV: missing fmt/data chunk")
    if fmt_tag != 1:  # integer PCM only
        raise ValueError(f"unsupported WAV format tag {fmt_tag} (PCM only)")
    if bits == 8:  # 8-bit PCM is unsigned, centered on 128
        samples = [b - 128 for b in data]
    elif bits == 16:
        samples = list(struct.unpack(f"<{len(data) // 2}h", data[: len(data) // 2 * 2]))
    elif bits == 32:
        samples = list(struct.unpack(f"<{len(data) // 4}i", data[: len(data) // 4 * 4]))
    else:
        raise ValueError(f"unsupported PCM bit depth {bits}")
    return (rate, channels, samples)


AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("channels", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("peak_abs", T.LongType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def extract_audio_stats_real(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas body over REAL integer-PCM WAV payloads: decodes every
    sample (decode_wav_pcm) and emits per-clip loudness stats — the
    payload-level audio feature pass (silence/clipping filters, loudness
    normalization) a training-data pipeline runs before transcription.
    Partition-local, one Arrow crossing per batch, like extract_features_real."""
    for pdf in batches:
        out = {k: [] for k in (
            "doc_id", "sample_rate", "channels", "n_samples", "peak_abs", "rms"
        )}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            rate, channels, samples = decode_wav_pcm(bytes(payload))
            n = len(samples)
            out["doc_id"].append(doc_id)
            out["sample_rate"].append(rate)
            out["channels"].append(channels)
            out["n_samples"].append(n)
            out["peak_abs"].append(max((abs(s) for s in samples), default=0))
            out["rms"].append(
                (sum(s * s for s in samples) / n) ** 0.5 if n else 0.0
            )
        yield pd.DataFrame(out)


def _decode_wav_header(payload: bytes) -> tuple[int, int, int]:
    """Walk the RIFF chunk list for fmt (rate/channels/block align) and data
    (byte size); audio frames = data bytes / block align."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    channels = rate = block_align = data_size = None
    pos = 12
    while pos + 8 <= len(payload):
        cid, csize = struct.unpack("<4sI", payload[pos : pos + 8])
        if cid == b"fmt " and csize >= 16:
            channels, rate = struct.unpack("<HI", payload[pos + 10 : pos + 16])
            block_align = struct.unpack("<H", payload[pos + 20 : pos + 22])[0]
        elif cid == b"data":
            data_size = csize
        pos += 8 + csize + (csize & 1)  # chunks are word-aligned
    if None in (channels, rate, block_align, data_size) or block_align == 0:
        raise ValueError("not a WAV: missing fmt/data chunk")
    return (rate, channels, data_size // block_align)


def _mp4_boxes(payload: bytes, start: int, end: int):
    """Yield (type, body_start, box_end) for the sibling ISO-BMFF boxes in
    payload[start:end) (ISO 14496-12 §4.2: u32 size + 4-char type, size==1
    -> u64 largesize follows, size==0 -> box runs to the end)."""
    pos = start
    while pos + 8 <= end:
        size, btype = struct.unpack(">I4s", payload[pos : pos + 8])
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("not an MP4: truncated largesize box")
            (size,) = struct.unpack(">Q", payload[pos + 8 : pos + 16])
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError("not an MP4: bad box size")
        yield btype, body, pos + size
        pos += size


def _mp4_stsz_count(payload: bytes, start: int, end: int) -> int:
    """Sample count from the stsz box, descending minf/stbl containers."""
    for btype, body, box_end in _mp4_boxes(payload, start, end):
        if btype in (b"minf", b"stbl"):
            n = _mp4_stsz_count(payload, body, box_end)
            if n:
                return n
        elif btype == b"stsz" and body + 12 <= box_end:
            return struct.unpack(">I", payload[body + 8 : body + 12])[0]
    return 0


def decode_mp4_metadata(payload: bytes) -> dict:
    """REAL MP4 / ISO-BMFF container-metadata decode — the video twin of the
    WAV RIFF walk (same pure-struct difficulty, no codec needed): major
    brand from ftyp, movie duration/timescale from mvhd (v0 and v1 layouts),
    and the video track's pixel dimensions (tkhd, 16.16 fixed point) plus
    sample count (stsz) from the first trak with nonzero dims.  Raises
    ValueError for bytes that are not an MP4 container."""
    top = list(_mp4_boxes(payload, 0, len(payload)))
    types = [t for t, _, _ in top]
    if b"ftyp" not in types or b"moov" not in types:
        raise ValueError("not an MP4: missing ftyp/moov box")
    ftyp_body = next(b for t, b, _ in top if t == b"ftyp")
    meta = {
        "brand": payload[ftyp_body : ftyp_body + 4].decode("ascii", "replace"),
        "timescale": 0,
        "duration": 0,
        "width": 0,
        "height": 0,
        "n_samples": 0,
    }
    moov_body, moov_end = next((b, e) for t, b, e in top if t == b"moov")
    for btype, body, box_end in _mp4_boxes(payload, moov_body, moov_end):
        if btype == b"mvhd":
            if payload[body] == 1:  # v1: 64-bit creation/modification/duration
                timescale, duration = struct.unpack(
                    ">IQ", payload[body + 20 : body + 32]
                )
            else:
                timescale, duration = struct.unpack(
                    ">II", payload[body + 12 : body + 20]
                )
            meta["timescale"], meta["duration"] = timescale, duration
        elif btype == b"trak":
            width = height = n_samples = 0
            for t2, b2, e2 in _mp4_boxes(payload, body, box_end):
                if t2 == b"tkhd":
                    # offset of the 16.16 width/height pair past version/
                    # flags + ids/durations + reserved/layer block + matrix
                    off = b2 + (4 + 32 if payload[b2] == 1 else 4 + 20) + 8 + 8 + 36
                    w16, h16 = struct.unpack(">II", payload[off : off + 8])
                    width, height = w16 >> 16, h16 >> 16
                elif t2 == b"mdia":
                    n_samples = _mp4_stsz_count(payload, b2, e2)
            if width and height and not meta["width"]:
                meta["width"], meta["height"] = width, height
                meta["n_samples"] = n_samples
    meta["duration_sec"] = (
        meta["duration"] / meta["timescale"] if meta["timescale"] else 0.0
    )
    return meta


def decode_video_frames(payload: bytes):
    """THE narrowed codec seam — and the repo's only NotImplementedError:
    frame decode of video payloads needs a codec stack (ffmpeg/pyav),
    which this container does not ship.  All container METADATA (brand,
    duration, dimensions, sample count) is decoded for real by
    decode_mp4_metadata, and still-image pixel decode is real for PNG
    (decode_png_pixels)."""
    raise NotImplementedError(
        "no video codec available for frame decode; install ffmpeg/pyav "
        "and extend decode_video_frames"
    )


def extract_features_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body wired to the REAL decoder — same FEATURE_SCHEMA as
    extract_features, for payloads that are actual PNG/WAV bytes.  The
    fixture payloads are utf8 text (so the SQL oracle can re-derive them),
    hence the registered query keeps the fake path; this stage is what a
    production caller with real media columns uses, and the golden test
    drives it with genuine bytes."""
    for pdf in batches:
        out = {k: [] for k in ("doc_id", "content_type", "byte_len",
                               "sha256_hex", "width", "height", "n_frames")}
        for doc_id, ct, payload in zip(
            pdf["doc_id"], pdf["content_type"], pdf["payload"]
        ):
            raw = bytes(payload)
            width, height, n_frames = decode_media(raw, ct)
            out["doc_id"].append(doc_id)
            out["content_type"].append(ct)
            out["byte_len"].append(len(raw))
            out["sha256_hex"].append(hashlib.sha256(raw).hexdigest())
            out["width"].append(width)
            out["height"].append(height)
            out["n_frames"].append(n_frames)
        yield pd.DataFrame(out)


def fake_decode_features(payload: bytes) -> tuple[int, str, int, int, int]:
    """Deterministic stand-in for decode: every 'feature' is a pure function
    of the payload bytes, so tests and the SQL oracle can verify the full
    mapInPandas path end-to-end."""
    n = len(payload)
    return (
        n,
        hashlib.sha256(payload).hexdigest(),
        n % 640 + 1,  # fake width
        (n * 7) % 480 + 1,  # fake height
        n % 30 + 1,  # fake frame count
    )


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: one Arrow batch in, one features frame out.
    Vectorized per batch; nothing is collected to the driver."""
    for pdf in batches:
        feats = pdf["payload"].map(fake_decode_features)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "content_type": pdf["content_type"],
                "byte_len": feats.map(lambda t: t[0]),
                "sha256_hex": feats.map(lambda t: t[1]),
                "width": feats.map(lambda t: t[2]),
                "height": feats.map(lambda t: t[3]),
                "n_frames": feats.map(lambda t: t[4]),
            }
        )


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal input contract: (doc_id, content_type, payload binary).
    Payload bytes derive from documents.text so the oracle can rebuild them;
    in production this column comes from the object store."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(ct) for ct in CONTENT_TYPES]),
            (F.col("doc_id") % 3).cast("int") + 1,
        ).alias("content_type"),
        F.col("text").cast("binary").alias("payload"),
    )


RESIZE_TARGET = (224, 224)  # the standard vision-model input size

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("src_width", T.LongType()),
        T.StructField("src_height", T.LongType()),
        T.StructField("dst_width", T.LongType()),
        T.StructField("dst_height", T.LongType()),
        T.StructField("resized_sha", T.StringType()),
    ]
)


def fake_resize(payload: bytes, dst: tuple[int, int]) -> tuple[int, int, str]:
    """Deterministic resize stand-in: source dims from the fake decode,
    'resized bytes' = payload tagged with the target box (a real build
    decodes, resamples, re-encodes here — same signature)."""
    n = len(payload)
    src_w, src_h = n % 640 + 1, (n * 7) % 480 + 1
    resized = hashlib.sha256(payload + f"@{dst[0]}x{dst[1]}".encode()).hexdigest()
    return (src_w, src_h, resized)


def resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas resize stage: one row in, one row out, partition-local."""
    dst_w, dst_h = RESIZE_TARGET
    for pdf in batches:
        feats = pdf["payload"].map(lambda p: fake_resize(p, RESIZE_TARGET))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "src_width": feats.map(lambda t: t[0]),
                "src_height": feats.map(lambda t: t[1]),
                "dst_width": dst_w,
                "dst_height": dst_h,
                "resized_sha": feats.map(lambda t: t[2]),
            }
        )


@register(
    "q_multimodal_resize",
    oracle=f"""
    SELECT doc_id,
           CAST(octet_length(text::BLOB) % 640 + 1 AS BIGINT) AS src_width,
           CAST((octet_length(text::BLOB) * 7) % 480 + 1 AS BIGINT) AS src_height,
           CAST({RESIZE_TARGET[0]} AS BIGINT) AS dst_width,
           CAST({RESIZE_TARGET[1]} AS BIGINT) AS dst_height,
           sha256(text || '@{RESIZE_TARGET[0]}x{RESIZE_TARGET[1]}') AS resized_sha
    FROM documents
    """,
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage over binary payloads through mapInPandas (stubbed
    resampler, real Arrow plumbing): emits source/target geometry and the
    digest of the 'resized' bytes, all oracle-verified from the same
    payload bytes.  Partition-local, no shuffle; a real codec swaps into
    fake_resize without touching the plan."""
    return media_table(spark, sf_dir).mapInPandas(resize_batch, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_sha", T.StringType()),
    ]
)


def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas frame sampler: one output row per SAMPLED frame (every
    5th of the fake n_frames), each tagged with a per-frame content hash —
    the row-exploding shape a video pipeline needs (decode is the same
    stub; a real build hashes the decoded frame bytes instead)."""
    for pdf in batches:
        out = {"doc_id": [], "frame_idx": [], "frame_sha": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_frames = len(payload) % 30 + 1
            for idx in range(0, n_frames, 5):
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(idx)
                out["frame_sha"].append(
                    hashlib.sha256(payload + str(idx).encode()).hexdigest()
                )
        yield pd.DataFrame(out)


@register(
    "q_multimodal_framesample",
    oracle="""
    WITH f AS (
        SELECT doc_id, text,
               unnest(generate_series(0, octet_length(text::BLOB) % 30, 5)) AS fi
        FROM documents
    )
    SELECT doc_id,
           CAST(fi AS BIGINT) AS frame_idx,
           sha256(text || CAST(fi AS VARCHAR)) AS frame_sha
    FROM f
    """,
)
def q_multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling through mapInPandas: each media payload fans out to
    every-5th-frame rows with per-frame hashes.  The oracle rebuilds the
    same rows in SQL (payload bytes = utf8 text, frame hash = sha256 of
    payload ++ ascii frame index), so the row-exploding Python stage is
    value-checked end-to-end.

    Scale: output cardinality is rows x frames/5; the stage stays
    partition-local (no shuffle) and streams Arrow batches."""
    return media_table(spark, sf_dir).mapInPandas(sample_frames, FRAME_SCHEMA)


@register(
    "q_multimodal_features",
    oracle="""
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'image/png'
                           WHEN 1 THEN 'audio/wav'
                           ELSE 'video/mp4' END AS content_type,
           CAST(octet_length(text::BLOB) AS BIGINT) AS byte_len,
           sha256(text) AS sha256_hex,
           CAST(octet_length(text::BLOB) % 640 + 1 AS BIGINT) AS width,
           CAST((octet_length(text::BLOB) * 7) % 480 + 1 AS BIGINT) AS height,
           CAST(octet_length(text::BLOB) % 30 + 1 AS BIGINT) AS n_frames
    FROM documents
    """,
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload feature extraction through mapInPandas (Arrow batches,
    stubbed decode).  The oracle recomputes every feature from the same
    bytes in SQL, so the whole JVM->Arrow->pandas->JVM round trip is
    value-checked, not just smoke-tested.

    Scale: mapInPandas preserves partitioning (no shuffle); per-batch cost
    is the decode itself.  With real codecs the same stage fans out across
    executors; metadata-only consumers never touch the payload column
    thanks to parquet column pruning."""
    return media_table(spark, sf_dir).mapInPandas(extract_features, FEATURE_SCHEMA)
