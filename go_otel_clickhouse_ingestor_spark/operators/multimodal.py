"""Multimodal columns (BASELINE.json north-star).

Design: media (image/audio/video) travels as an opaque ``binary``
column with a typed metadata struct alongside — the layout every
large-scale multimodal corpus uses (WebDataset / Parquet-BLOB).  The
Spark-side plumbing is real and tested: schema, struct bundling,
nested access, and Arrow-batched ``mapInPandas`` decode with a
documented batch shape.  Codecs: BMP (24-bit) and WAV (PCM16) decode
FOR REAL with stdlib struct + numpy (``decode_bmp``/``decode_wav`` —
no PIL/torchaudio needed); formats that require external libraries
(JPEG/PNG/video) raise ``NotImplementedError`` at the clearly marked
boundary, and a deterministic fake codec keeps the plumbing testable
for those payloads.

Since the driver fixtures carry no binary column, the payload here is
the utf-8 encoding of ``documents.text`` — the plumbing doesn't care
what the bytes mean.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..tables import table

#: Output schema of the decode stage — what a real image decoder would
#: emit (dimensions from the header, a tiny feature vector).
DECODE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, width long, height long, "
    "f0 double, f1 double, f2 double, f3 double"
)


def bmp_pixels(buf: bytes):
    """Parse an uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB)
    into a (height, width, 3) uint8 array in raster (top-down) order,
    channels B,G,R — stdlib struct + numpy only, no PIL.  Format
    reference: the public Windows BMP file-format layout (14-byte file
    header + 40-byte DIB header, rows padded to 4 bytes, stored
    bottom-up)."""
    import struct

    import numpy as np

    if buf[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", buf, 10)[0]
    width, height = struct.unpack_from("<ii", buf, 18)
    planes, bpp = struct.unpack_from("<HH", buf, 26)
    compression = struct.unpack_from("<I", buf, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24-bit uncompressed BMP is supported (bpp={bpp}, "
            f"compression={compression})"
        )
    row_bytes = (width * 3 + 3) & ~3
    px = np.frombuffer(
        buf, dtype=np.uint8, count=abs(height) * row_bytes, offset=data_off
    ).reshape(abs(height), row_bytes)[:, : width * 3]
    if height > 0:  # bottom-up storage: flip to raster order
        px = px[::-1]
    return px.reshape(abs(height), width, 3)


def decode_bmp(buf: bytes) -> tuple:
    """REAL decode of an uncompressed 24-bit BMP: header dims + channel
    means.  Returns (width, height, mean_b, mean_g, mean_r,
    brightness)."""
    px = bmp_pixels(buf).astype("float64")
    height, width = px.shape[:2]
    mean_b, mean_g, mean_r = (float(px[..., c].mean()) for c in range(3))
    return (
        width,
        height,
        mean_b / 255.0,
        mean_g / 255.0,
        mean_r / 255.0,
        (mean_b + mean_g + mean_r) / (3 * 255.0),
    )


def resize_bmp(buf: bytes, max_side: int) -> "tuple":
    """REAL aspect-preserving resize of a 24-bit BMP — nearest-neighbor
    resampling in numpy (pixel-center sampling, the classic NN rule),
    downscale-only, re-encoded as a real BMP.  Returns (out_buf, in_w,
    in_h, out_w, out_h).  No PIL/cv2: index arithmetic over the
    decoded pixel grid IS the resampler."""
    import numpy as np

    px = bmp_pixels(buf)
    in_h, in_w = px.shape[:2]
    scale = min(max_side / max(in_w, in_h), 1.0)
    out_w = max(int(round(in_w * scale)), 1)
    out_h = max(int(round(in_h * scale)), 1)
    yi = np.clip(
        np.round((np.arange(out_h) + 0.5) * in_h / out_h - 0.5).astype(int),
        0,
        in_h - 1,
    )
    xi = np.clip(
        np.round((np.arange(out_w) + 0.5) * in_w / out_w - 0.5).astype(int),
        0,
        in_w - 1,
    )
    out = px[yi][:, xi]
    buf_out = encode_bmp(
        out_w, out_h, lambda x, y: tuple(int(v) for v in out[y, x])
    )
    return buf_out, in_w, in_h, out_w, out_h


def wav_samples(buf: bytes):
    """Parse a PCM16 mono RIFF/WAVE payload (chunk walk: fmt + data)
    into (sample_rate, float64 sample array) — stdlib struct + numpy
    only, no torchaudio.  Format reference: the public RIFF/WAVE chunk
    layout (fmt chunk: audio format 1 = PCM)."""
    import struct

    import numpy as np

    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(buf):
        cid, size = buf[pos : pos + 4], struct.unpack_from("<I", buf, pos + 4)[0]
        body = pos + 8
        if cid == b"fmt ":
            fmt, channels, rate = struct.unpack_from("<HHI", buf, body)
            bits = struct.unpack_from("<H", buf, body + 14)[0]
            if fmt != 1 or bits != 16 or channels != 1:
                raise NotImplementedError(
                    f"only PCM16 mono WAV is supported (fmt={fmt}, "
                    f"bits={bits}, channels={channels})"
                )
        elif cid == b"data":
            samples = np.frombuffer(
                buf, dtype="<i2", count=size // 2, offset=body
            ).astype(np.float64)
        pos = body + size + (size & 1)
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return rate, samples


def decode_wav(buf: bytes) -> tuple:
    """REAL decode of a PCM16 mono RIFF/WAVE payload: returns
    (sample_rate, n_samples, rms, zero_crossing_rate)."""
    import numpy as np

    rate, samples = wav_samples(buf)
    rms = float(np.sqrt((samples**2).mean())) / 32768.0 if len(samples) else 0.0
    zc = (
        float((np.signbit(samples[1:]) != np.signbit(samples[:-1])).mean())
        if len(samples) > 1
        else 0.0
    )
    return rate, len(samples), rms, zc


def _try_pil():
    """Optional-dependency hook: Pillow when importable, else None —
    the ``SPARK_GRAFT_KAFKA_BROKERS`` pattern applied to codecs (the
    capability self-arms where the environment provides it; the
    dependency-free BMP/WAV path stays the default and the tests
    skip cleanly where Pillow is absent)."""
    try:  # pragma: no cover - depends on the container
        from PIL import Image

        return Image
    except ImportError:
        return None


def decode_pil(buf: bytes) -> tuple:
    """REAL decode of a JPEG/PNG payload via Pillow (only called when
    ``_try_pil()`` found it): same contract as ``decode_bmp`` —
    (width, height, mean_b, mean_g, mean_r, brightness)."""
    import io

    import numpy as np

    img = _try_pil().open(io.BytesIO(buf)).convert("RGB")
    px = np.asarray(img).astype("float64")  # (h, w, RGB)
    height, width = px.shape[:2]
    mean_r, mean_g, mean_b = (float(px[..., c].mean()) for c in range(3))
    return (
        width,
        height,
        mean_b / 255.0,
        mean_g / 255.0,
        mean_r / 255.0,
        (mean_b + mean_g + mean_r) / (3 * 255.0),
    )


def decode_media_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Decode one Arrow batch of media payloads.

    Three codecs exist in this dependency-free container:

    - ``bmp``  — REAL (``decode_bmp``: struct + numpy; 24-bit BI_RGB)
    - ``wav``  — REAL (``decode_wav``: struct + numpy; PCM16 mono)
    - ``fake`` — the DETERMINISTIC stand-in (md5-derived dimensions/
      features) that keeps plumbing testable for payloads with no
      dependency-free codec

    plus ``jpeg``/``png`` WHEN Pillow is importable (``_try_pil``) —
    the optional-dependency opt-in; where it is absent those types
    still raise ``NotImplementedError`` so the gap stays explicit
    (video always does: pyav).  All codecs emit the same
    ``DECODE_SCHEMA`` row: for bmp/jpeg/png, (width, height) are the
    real decoded dimensions and f0..f3 = (mean_b, mean_g, mean_r,
    brightness); for wav, width=sample_rate, height=n_samples and
    f0..f1 = (rms, zero-crossing rate).
    """
    import hashlib

    known = {"fake", "bmp", "wav"}
    pil_types = {"jpeg", "png"} if _try_pil() is not None else set()
    unknown = set(pdf["media_type"]) - known - pil_types
    if unknown:  # pragma: no cover - real codecs absent
        raise NotImplementedError(
            f"media types {sorted(unknown)} need external codecs "
            "(PIL/pyav); dependency-free codecs here: bmp, wav, fake"
        )
    out = []
    for doc_id, media, payload in zip(
        pdf["doc_id"], pdf["media_type"], pdf["payload"]
    ):
        buf = bytes(payload)
        if media == "bmp":
            w, h, f0, f1, f2, f3 = decode_bmp(buf)
            row = dict(width=w, height=h, f0=f0, f1=f1, f2=f2, f3=f3)
        elif media in pil_types:  # pragma: no cover - Pillow-only path
            try:
                w, h, f0, f1, f2, f3 = decode_pil(buf)
            except Exception as exc:  # noqa: BLE001 - re-raise with row context
                # a truncated/corrupt payload surfaces as PIL's own
                # UnidentifiedImageError; wrap it so the failing row is
                # identifiable from the task error
                raise ValueError(
                    f"undecodable {media} payload for doc_id={doc_id} "
                    f"({len(buf)} bytes): {exc}"
                ) from exc
            row = dict(width=w, height=h, f0=f0, f1=f1, f2=f2, f3=f3)
        elif media == "wav":
            rate, n, rms, zc = decode_wav(buf)
            row = dict(width=rate, height=n, f0=rms, f1=zc, f2=0.0, f3=0.0)
        else:
            digest = hashlib.md5(buf).digest()
            # Feature vector flattened to scalar columns: array cells
            # are unhashable in the canonicalized comparison, so the
            # 4-dim "feature" crosses the boundary as f0..f3.
            row = dict(
                width=16 + digest[0] % 64,
                height=16 + digest[1] % 64,
                f0=digest[0] / 255.0,
                f1=digest[1] / 255.0,
                f2=digest[2] / 255.0,
                f3=digest[3] / 255.0,
            )
        out.append(
            {
                "doc_id": doc_id,
                "media_type": media,
                "n_bytes": len(buf),
                **row,
            }
        )
    return pd.DataFrame(out)


def _decode_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        if len(pdf):
            yield decode_media_batch(pdf)


@query(
    "multimodal_cols",
    oracle="""
    SELECT d.doc_id,
           d.text                 AS meta_text,
           d.lang                 AS meta_lang,
           octet_length(encode(d.text)) AS payload_bytes,
           len(e.embedding)::BIGINT AS dim,
           e.embedding[1]         AS first_val
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    """,
)
def multimodal_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal record assembly: bundle text + metadata + binary
    payload + embedding into one struct column, then project nested
    fields back out (what a training-data loader does).  The struct is
    built and consumed inside the plan — proof the nested schema works
    end-to-end — while the output is flat for the oracle."""
    d = table(spark, sf_dir, "documents")
    e = table(spark, sf_dir, "embeddings")
    rec = d.join(e, d.doc_id == e.vec_id).select(
        "doc_id",
        F.struct(
            F.col("text").alias("text"),
            F.col("lang").alias("lang"),
            F.encode("text", "utf-8").alias("payload"),
            F.col("embedding").alias("embedding"),
        ).alias("record"),
    )
    r = F.col("record")
    return rec.select(
        "doc_id",
        r.getField("text").alias("meta_text"),
        r.getField("lang").alias("meta_lang"),
        F.octet_length(r.getField("payload")).cast("long").alias("payload_bytes"),
        F.size(r.getField("embedding")).cast("long").alias("dim"),
        F.element_at(r.getField("embedding"), 1).alias("first_val"),
    )


@query("multimodal_decode")  # rows-only: decode stage is a stubbed codec
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The media-decode stage: binary payloads through an Arrow-batched
    ``mapInPandas`` decoder with a typed output schema.

    Scale notes: decode is embarrassingly parallel — it inherits the
    scan partitioning (``maxPartitionBytes`` sizes the batches) and
    adds zero shuffles; the pandas UDF boundary is the right place for
    a C codec because the payload bytes cross into Python exactly
    once, Arrow-batched."""
    d = table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    payloads = d.select(
        "doc_id",
        F.lit("fake").alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
    )
    return payloads.mapInPandas(_decode_iter, DECODE_SCHEMA)


def encode_bmp(width: int, height: int, pixel_fn) -> bytes:
    """Build a real uncompressed 24-bit BMP (bottom-up, BI_RGB).
    ``pixel_fn(x, y) -> (b, g, r)`` in raster (top-down) coordinates.
    Used to synthesize genuine image payloads for the codec tests and
    the decode-codecs query — the fixtures ship no binary column."""
    import struct

    row_bytes = (width * 3 + 3) & ~3
    img_size = row_bytes * height
    header = b"BM" + struct.pack(
        "<IHHI", 14 + 40 + img_size, 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 0, 0, 0, 0)
    rows = []
    for y in reversed(range(height)):  # bottom-up storage
        row = bytearray()
        for x in range(width):
            b, g, r = pixel_fn(x, y)
            row += bytes((b, g, r))
        row += b"\x00" * (row_bytes - width * 3)
        rows.append(bytes(row))
    return header + b"".join(rows)


def encode_wav(rate: int, samples) -> bytes:
    """Build a real PCM16 mono RIFF/WAVE payload from int16 samples."""
    import struct

    import numpy as np

    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def _synth_codec_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per document, synthesize one REAL BMP and one REAL WAV payload
    (dimensions/content derived deterministically from doc_id) — the
    binary-landing stand-in, since the fixtures carry no media blobs."""
    for pdf in batches:
        if not len(pdf):
            continue
        out = []
        for doc_id in pdf["doc_id"]:
            seed = int(doc_id)
            w, h = 4 + seed % 5, 3 + seed % 4
            bmp = encode_bmp(
                w, h, lambda x, y: ((x * 37 + seed) % 256, (y * 59 + seed) % 256, (x + y + seed) % 256)
            )
            n = 64 + seed % 32
            wav = encode_wav(
                8000, [((seed + i) * 997) % 32768 - 16384 for i in range(n)]
            )
            out.append({"doc_id": doc_id, "media_type": "bmp", "payload": bmp})
            out.append({"doc_id": doc_id, "media_type": "wav", "payload": wav})
        yield pd.DataFrame(out)


@query("multimodal_decode_codecs")  # rows-only: binary codecs, no SQL twin
def multimodal_decode_codecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL media decoding through the production decode stage: per
    document, a genuine 24-bit BMP and a genuine PCM16 WAV are
    synthesized (mapInPandas; the fixtures ship no binary column) and
    decoded by the dependency-free ``decode_bmp``/``decode_wav``
    parsers — actual header parsing, pixel/sample math in numpy — not
    the deterministic fake.  Same stage signature and schema as
    ``multimodal_decode``; JPEG/PNG/video still raise at the
    documented external-codec boundary.  Scale: both stages are
    map-only Arrow passes, zero shuffles; payload bytes never leave
    the task that made them."""
    d = table(spark, sf_dir, "documents")
    payloads = d.select("doc_id").mapInPandas(
        _synth_codec_iter, "doc_id long, media_type string, payload binary"
    )
    return payloads.mapInPandas(_decode_iter, DECODE_SCHEMA)


#: Frame-sample output: one row per sampled frame per document.
FRAME_SCHEMA = "doc_id long, frame_idx long, offset_bytes long, frame_feat double"

#: Frames sampled per payload (a real sampler would use container
#: timestamps; the stub samples evenly by byte offset).
N_FRAMES = 4


def sample_frames_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Frame sampling for one Arrow batch: each payload row EXPANDS to
    ``N_FRAMES`` output rows — the 1→N shape of video processing.  The
    codec is the same deterministic fake as ``decode_media_batch``
    (real demuxers need pyav, absent here): frame k's "feature" is a
    hash of the payload bytes at its offset."""
    import hashlib

    if (pdf["media_type"] != "fake").any():  # pragma: no cover
        raise NotImplementedError(
            "real frame sampling needs a demuxer (pyav); only the "
            "deterministic 'fake' codec exists in this environment"
        )
    out = []
    for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
        buf = bytes(payload)
        step = max(len(buf) // N_FRAMES, 1)
        for k in range(N_FRAMES):
            off = min(k * step, max(len(buf) - 1, 0))
            digest = hashlib.md5(buf[off : off + step]).digest()
            out.append(
                {
                    "doc_id": doc_id,
                    "frame_idx": k,
                    "offset_bytes": off,
                    "frame_feat": digest[0] / 255.0,
                }
            )
    return pd.DataFrame(out)


def _frames_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        if len(pdf):
            yield sample_frames_batch(pdf)


@query("multimodal_framesample")  # rows-only: stubbed codec
def multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling: mapInPandas where one input row
    yields N output rows (the generator/UDTF shape at the Python
    boundary).  Same scale properties as decode — partition-parallel,
    zero shuffles, payload bytes cross to Python once — plus the row
    EXPANSION is in-batch, so downstream operators see N_FRAMES× rows
    without any explode shuffle."""
    d = table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    payloads = d.select(
        "doc_id",
        F.lit("fake").alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
    )
    return payloads.mapInPandas(_frames_iter, FRAME_SCHEMA)


#: Output schema of the resize stage — target geometry + the letterbox
#: scale a real resampler would apply before the pixel pass.
RESIZE_SCHEMA = (
    "doc_id long, width long, height long, out_w long, out_h long, "
    "scale double, resized_bytes long"
)

#: Resize target: longest side (the CLIP/SigLIP-style preprocessing
#: contract — aspect ratio preserved, no crop).
_RESIZE_MAX_SIDE = 224


def resize_media_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """'Resize' one decoded Arrow batch: compute the target geometry a
    real resampler (PIL.Image.resize / cv2) would use — aspect-
    preserving fit into 224 on the longest side, never upscaled — and
    a deterministic stand-in for the resized payload size (out_w·out_h
    ·3, the RGB buffer a real pass would allocate).  The pixel
    resample itself needs PIL/cv2 (absent here); geometry math and the
    Arrow plumbing are the real, tested surface."""
    out = pd.DataFrame()
    out["doc_id"] = pdf["doc_id"]
    out["width"] = pdf["width"]
    out["height"] = pdf["height"]
    longest = pdf[["width", "height"]].max(axis=1)
    scale = (_RESIZE_MAX_SIDE / longest).clip(upper=1.0)
    out["out_w"] = (pdf["width"] * scale).round().astype("int64").clip(lower=1)
    out["out_h"] = (pdf["height"] * scale).round().astype("int64").clip(lower=1)
    out["scale"] = scale.round(6)
    out["resized_bytes"] = out["out_w"] * out["out_h"] * 3
    return out


def _resize_iter(batches):
    for pdf in batches:
        if len(pdf):
            yield resize_media_batch(pdf)


@query("multimodal_resize")  # rows-only: stubbed resampler (geometry is real)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode → resize as chained Arrow stages: the decode pass emits
    header geometry, the resize pass computes the aspect-preserving
    224-fit a vision-model preprocessor applies (downscale-only,
    letterbox scale carried for de-normalization).  Two mapInPandas
    stages pipeline WITHOUT a shuffle between them — at 100 TB this is
    one map-only pass per media file, embarrassingly parallel, with
    Arrow batches amortizing the Python boundary.  pytest asserts the
    geometry invariants (aspect ratio preserved to rounding, ≤224,
    never upscaled)."""
    d = table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    payload = d.select(
        "doc_id",
        F.lit("fake").alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
    )
    decoded = payload.mapInPandas(_decode_iter, DECODE_SCHEMA)
    return decoded.mapInPandas(_resize_iter, RESIZE_SCHEMA)


#: Real-resize target: small enough that the synthetic images (below)
#: actually downscale — the geometry contract is identical at 224.
_RESIZE_REAL_MAX_SIDE = 32


def _synth_large_bmp_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per document, one REAL BMP large enough that the 32-fit resize
    genuinely resamples (20–83 px sides, deterministic from doc_id)."""
    for pdf in batches:
        if not len(pdf):
            continue
        out = []
        for doc_id in pdf["doc_id"]:
            seed = int(doc_id)
            w, h = 20 + seed % 64, 15 + (seed * 7) % 48
            buf = encode_bmp(
                w,
                h,
                lambda x, y: (
                    (x * 31 + seed) % 256,
                    (y * 47 + seed) % 256,
                    (x * y + seed) % 256,
                ),
            )
            out.append({"doc_id": doc_id, "payload": buf})
        yield pd.DataFrame(out)


def _resize_real_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        if not len(pdf):
            continue
        out = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            buf_out, in_w, in_h, out_w, out_h = resize_bmp(
                bytes(payload), _RESIZE_REAL_MAX_SIDE
            )
            # decode the RE-ENCODED output — proves the resized buffer
            # is itself a valid BMP of the claimed geometry
            rw, rh, *_ = decode_bmp(buf_out)
            assert (rw, rh) == (out_w, out_h)
            out.append(
                {
                    "doc_id": doc_id,
                    "width": in_w,
                    "height": in_h,
                    "out_w": out_w,
                    "out_h": out_h,
                    "scale": round(min(_RESIZE_REAL_MAX_SIDE / max(in_w, in_h), 1.0), 6),
                    "resized_bytes": len(buf_out),
                }
            )
        yield pd.DataFrame(out)


#: Real audio framing grid — the standard 20 ms / 10 ms windows at
#: 8 kHz, the same geometry ``multimodal_audio_frames`` oracle-checks.
_AF_FRAME, _AF_HOP = 160, 80


def _audio_features_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Decode REAL WAV payloads and window the PCM into overlapping
    frames with numpy stride tricks — per-frame RMS and zero-crossing
    rate, the front of every speech-feature pipeline."""
    import numpy as np

    for pdf in batches:
        if not len(pdf):
            continue
        out = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            rate, samples = wav_samples(bytes(payload))
            n = len(samples)
            if n < _AF_FRAME:
                continue
            n_frames = 1 + (n - _AF_FRAME) // _AF_HOP
            idx = (
                np.arange(_AF_FRAME)[None, :]
                + _AF_HOP * np.arange(n_frames)[:, None]
            )
            frames = samples[idx]
            rms = np.sqrt((frames**2).mean(axis=1)) / 32768.0
            zc = (
                np.signbit(frames[:, 1:]) != np.signbit(frames[:, :-1])
            ).mean(axis=1)
            for k in range(n_frames):
                out.append(
                    {
                        "doc_id": doc_id,
                        "frame_idx": k,
                        "offset_samples": k * _AF_HOP,
                        "rms": round(float(rms[k]), 6),
                        "zcr": round(float(zc[k]), 6),
                    }
                )
        yield pd.DataFrame(
            out,
            columns=["doc_id", "frame_idx", "offset_samples", "rms", "zcr"],
        )


def _synth_wav_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """One REAL PCM16 WAV per document, long enough for several 20 ms
    frames (320–831 samples, deterministic from doc_id)."""
    for pdf in batches:
        if not len(pdf):
            continue
        out = []
        for doc_id in pdf["doc_id"]:
            seed = int(doc_id)
            n = 320 + (seed * 13) % 512
            wav = encode_wav(
                8000, [((seed + i) * 997) % 32768 - 16384 for i in range(n)]
            )
            out.append({"doc_id": doc_id, "payload": wav})
        yield pd.DataFrame(out)


@query("multimodal_audio_features_codecs")  # rows-only: binary codec
def multimodal_audio_features_codecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio frame features, dependency-free: genuine PCM16 WAV
    payloads decoded by ``decode_wav`` and windowed into the standard
    20 ms / 10 ms grid (the exact geometry ``multimodal_audio_frames``
    oracle-checks) with vectorized per-frame RMS + zero-crossing rate
    — the frame-sample stage of the triad upgraded from the
    deterministic fake to actual sample math.  1→N in-batch expansion,
    map-only, zero shuffles."""
    d = table(spark, sf_dir, "documents")
    payloads = d.select("doc_id").mapInPandas(
        _synth_wav_iter, "doc_id long, payload binary"
    )
    return payloads.mapInPandas(
        _audio_features_iter,
        "doc_id long, frame_idx long, offset_samples long, rms double, zcr double",
    )


@query("multimodal_resize_codecs")  # rows-only: binary codec, no SQL twin
def multimodal_resize_codecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resizing end-to-end, dependency-free: synthesize a
    genuine 24-bit BMP per document, nearest-neighbor-resample its
    pixel grid in numpy to an aspect-preserving max-side fit
    (downscale-only), re-encode a valid BMP, and verify the output
    decodes to the claimed geometry — ``multimodal_resize``'s
    geometry-only stage upgraded to actual pixels for the format that
    needs no PIL.  Same shuffle-free chained-Arrow-stage shape."""
    d = table(spark, sf_dir, "documents")
    payloads = d.select("doc_id").mapInPandas(
        _synth_large_bmp_iter, "doc_id long, payload binary"
    )
    return payloads.mapInPandas(_resize_real_iter, RESIZE_SCHEMA)


@query(
    "multimodal_audio_frames",
    oracle="""
    WITH a AS (
      SELECT doc_id, octet_length(encode(text)) AS n_samples
      FROM documents
    ),
    f AS (
      SELECT doc_id, n_samples,
             cast(1 + (n_samples - 160) // 80 AS BIGINT) AS n_frames
      FROM a WHERE n_samples >= 160
    )
    SELECT f.doc_id, f.n_samples, f.n_frames,
           cast(g.frame_idx AS BIGINT)        AS frame_idx,
           cast(g.frame_idx * 80 AS BIGINT)   AS start_sample,
           cast(g.frame_idx * 80 + 160 AS BIGINT) AS end_sample,
           round((g.frame_idx * 80) / 8000.0, 6) AS start_s
    FROM f, (SELECT unnest(range(0, (SELECT max(n_frames) FROM f)))
             AS frame_idx) g
    WHERE g.frame_idx < f.n_frames
    """,
)
def multimodal_audio_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio frame-windowing plan: 8-bit PCM payloads at 8 kHz (the
    utf-8 text bytes standing in for waveforms, as in
    ``multimodal_decode``) cut into the standard 20 ms / 10 ms
    analysis grid — window 160 samples, hop 80 — emitting one row per
    frame with sample offsets and start time.  This is the Spark-side
    plumbing every audio feature extractor (fbank/MFCC/wav2vec
    chunking) sits on: the frame GEOMETRY is exact integer arithmetic
    (oracle-checked); the per-frame DSP would slot into the same
    ``mapInPandas`` stage as ``decode_media_batch``.  Frame expansion
    is a codegen ``sequence()`` explode — per-doc fan-out is
    n_samples/hop (bounded by the payload, the same contract as
    ``events_rolling_dau``'s 7× explode), partition-local, zero
    shuffles — the output is a transformation stage that scales with
    the corpus, not a report."""
    d = table(spark, sf_dir, "documents")
    a = d.select(
        "doc_id",
        F.octet_length(F.encode("text", "utf-8")).cast("long").alias("n_samples"),
    ).filter(F.col("n_samples") >= 160)
    f = a.select(
        "doc_id",
        "n_samples",
        (1 + F.floor((F.col("n_samples") - 160) / 80)).cast("long").alias("n_frames"),
    )
    return f.select(
        "doc_id",
        "n_samples",
        "n_frames",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx"),
    ).select(
        "doc_id",
        "n_samples",
        "n_frames",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        (F.col("frame_idx") * 80).cast("long").alias("start_sample"),
        (F.col("frame_idx") * 80 + 160).cast("long").alias("end_sample"),
        F.round((F.col("frame_idx") * 80) / 8000.0, 6).alias("start_s"),
    )


#: WebDataset shard contract: samples per tar shard.  Real pipelines
#: target ~1 GB shards; the invariant that matters is FIXED sample
#: count per shard + deterministic assignment, which is what's tested.
WDS_SAMPLES_PER_SHARD = 100


def write_webdataset_shards(df: DataFrame, out_dir: str) -> DataFrame:
    """Pack a multimodal corpus into WebDataset-style tar shards —
    the packaging format large multimodal training runs actually
    stream (one tar member pair per sample: ``{key}.txt`` payload +
    ``{key}.json`` metadata; a dataloader reads shards SEQUENTIALLY,
    turning random-access small-file IO into large sequential reads).

    Input contract: ``(doc_id long, payload binary, meta string)``.
    Sharding is deterministic — ``shard = doc_id // WDS_SAMPLES_PER_SHARD``
    via hash-free integer division, so reruns produce byte-stable
    shard membership — and each shard is written by exactly ONE task
    (repartition on shard id), the tar built in-memory with stdlib
    ``tarfile``, members sorted by key, all mtimes zeroed for
    reproducible bytes.  Returns the shard manifest as a DataFrame
    (shard_id, n_samples, n_bytes, path) — the index a dataloader
    consumes.

    Scale: one shuffle keyed on shard id; shard size is bounded by the
    samples-per-shard contract, never by task count; the manifest is
    O(shards).  (Parquet-BLOB is the queryable twin — this is the
    training-loader-facing export.)"""
    import io
    import os
    import tarfile

    spark = df.sparkSession
    os.makedirs(out_dir, exist_ok=True)

    def pack(pdfs):
        for pdf in pdfs:
            if not len(pdf):
                continue
            for shard_id, grp in pdf.groupby("shard_id"):
                buf = io.BytesIO()
                with tarfile.open(fileobj=buf, mode="w") as tar:
                    for _, row in grp.sort_values("doc_id").iterrows():
                        key = f"{int(row.doc_id):09d}"
                        for ext, data in (
                            ("txt", bytes(row.payload)),
                            ("json", str(row.meta).encode()),
                        ):
                            info = tarfile.TarInfo(name=f"{key}.{ext}")
                            info.size = len(data)
                            info.mtime = 0
                            tar.addfile(info, io.BytesIO(data))
                data = buf.getvalue()
                path = os.path.join(out_dir, f"shard-{int(shard_id):06d}.tar")
                with open(path, "wb") as fh:
                    fh.write(data)
                yield pd.DataFrame(
                    {
                        "shard_id": [int(shard_id)],
                        "n_samples": [len(grp)],
                        "n_bytes": [len(data)],
                        "path": [path],
                    }
                )

    sharded = df.withColumn(
        "shard_id", (F.col("doc_id") / WDS_SAMPLES_PER_SHARD).cast("long")
    ).repartition("shard_id")
    return sharded.mapInPandas(
        pack, "shard_id long, n_samples long, n_bytes long, path string"
    )


def read_webdataset_shards(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read WebDataset shards back to (doc_id, payload, meta) rows via
    the binaryFile source + a tarfile-unpacking mapInPandas — the
    dataloader's view, expressed as a DataFrame for verification."""
    import io
    import tarfile

    def unpack(pdfs):
        for pdf in pdfs:
            for _, row in pdf.iterrows():
                out = {}
                with tarfile.open(fileobj=io.BytesIO(bytes(row.content))) as tar:
                    for m in tar.getmembers():
                        key, ext = m.name.rsplit(".", 1)
                        out.setdefault(key, {})[ext] = tar.extractfile(m).read()
                rows = [
                    {
                        "doc_id": int(k),
                        "payload": v["txt"],
                        "meta": v["json"].decode(),
                    }
                    for k, v in sorted(out.items())
                ]
                yield pd.DataFrame(rows)

    files = spark.read.format("binaryFile").load(f"{out_dir}/shard-*.tar")
    return files.select("content").mapInPandas(
        unpack, "doc_id long, payload binary, meta string"
    )


#: Output schema of the byte-entropy scan (mapInArrow stage).
_ENTROPY_SCHEMA = (
    "doc_id long, n_bytes long, n_distinct long, byte_entropy double"
)


def _entropy_batches(batches):
    """Arrow-native per-batch byte statistics: no pandas conversion,
    no per-row Python in the numeric kernel — ``np.bincount`` over the
    raw payload bytes, vectorized log2 over the nonzero counts."""
    import numpy as np
    import pyarrow as pa

    for batch in batches:
        if batch.num_rows == 0:
            continue
        ids = batch.column("doc_id")
        payloads = batch.column("payload")
        n_bytes, n_distinct, entropy = [], [], []
        for buf in payloads:
            a = np.frombuffer(buf.as_py(), dtype=np.uint8)
            c = np.bincount(a, minlength=256)
            nz = c[c > 0].astype(np.float64)
            p = nz / a.size
            n_bytes.append(a.size)
            n_distinct.append(int(nz.size))
            entropy.append(float(-(p * np.log2(p)).sum()))
        yield pa.RecordBatch.from_arrays(
            [
                ids,
                pa.array(n_bytes, type=pa.int64()),
                pa.array(n_distinct, type=pa.int64()),
                pa.array(entropy, type=pa.float64()),
            ],
            names=["doc_id", "n_bytes", "n_distinct", "byte_entropy"],
        )


@query(
    "multimodal_byte_entropy",
    oracle="""
    WITH c AS (
      SELECT doc_id, ord(u.ch) AS b, count(*) AS n
      FROM documents, unnest(regexp_split_to_array(text, '')) AS u(ch)
      WHERE octet_length(encode(text)) > 0
      GROUP BY doc_id, ord(u.ch)
    ),
    t AS (
      SELECT doc_id, sum(n) AS nt, count(*) AS nd FROM c GROUP BY doc_id
    )
    SELECT c.doc_id,
           cast(max(t.nt) AS BIGINT) AS n_bytes,
           cast(max(t.nd) AS BIGINT) AS n_distinct,
           round(-sum((c.n / cast(t.nt AS DOUBLE))
                      * log2(c.n / cast(t.nt AS DOUBLE))), 6) AS byte_entropy
    FROM c JOIN t ON c.doc_id = t.doc_id
    GROUP BY c.doc_id
    """,
)
def multimodal_byte_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-payload byte-level Shannon entropy — the cheap
    compressibility / corruption probe a multimodal ingest runs on
    every opaque BLOB before spending decode time on it (truncated or
    double-compressed media shows as an entropy outlier for its
    media_type).  This is the engine's ``mapInArrow`` face: unlike the
    ``mapInPandas`` decode stage above, the payload bytes stay in
    Arrow buffers end-to-end — no pandas object boxing — and the
    kernel is one ``np.bincount`` + vectorized log2 per row.  The
    oracle walks the same distribution character-wise (the fixture
    payload is the utf-8 encoding of ASCII text, so chars ≡ bytes —
    asserted by the ``ord`` < 128 domain); both sides round(6) the
    entropy sum, whose addend order differs between engines.  Plan:
    scan → Arrow map (no shuffle, no agg) — embarrassingly parallel
    and linear in corpus bytes, the ideal 100 TB shape."""
    d = table(spark, sf_dir, "documents")
    src = d.filter(F.octet_length(F.encode("text", "utf-8")) > 0).select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    out = src.mapInArrow(_entropy_batches, _ENTROPY_SCHEMA)
    return out.select(
        "doc_id",
        "n_bytes",
        "n_distinct",
        F.round("byte_entropy", 6).alias("byte_entropy"),
    )


#: Contrastive-pair construction: negatives per anchor and the mixing
#: constant of the deterministic index stride (Knuth multiplicative
#: hash — any odd constant works; fixed so both engines agree).
_CONTRASTIVE_NEGS = 4
_CONTRASTIVE_STRIDE = 2654435761


@query(
    "multimodal_contrastive_pairs",
    oracle=f"""
    WITH idx AS (
      SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS ix,
             count(*) OVER () AS n
      FROM embeddings
    ),
    anchors AS (
      SELECT d.doc_id, i.ix, i.n
      FROM documents d JOIN idx i ON d.doc_id = i.vec_id
    ),
    negpick AS (
      SELECT a.doc_id,
             j.j,
             (a.ix + 1 + (a.ix * {_CONTRASTIVE_STRIDE} + j.j * 40503)
                          % (a.n - 1)) % a.n AS neg_ix
      FROM anchors a
      CROSS JOIN (SELECT unnest(range(1, {_CONTRASTIVE_NEGS + 1})) AS j) j
    )
    SELECT np.doc_id,
           np.doc_id        AS pos_vec_id,
           np.j::BIGINT     AS neg_slot,
           i.vec_id         AS neg_vec_id
    FROM negpick np JOIN idx i ON np.neg_ix = i.ix
    """,
)
def multimodal_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive training-pair construction (CLIP/InfoNCE shape):
    each document anchors its own embedding as the positive plus
    {_CONTRASTIVE_NEGS} DETERMINISTIC negatives — a stride-hashed index
    offset into the dense vector ranking, so every worker and every
    re-run builds the identical pair table with no RNG state (the
    pipeline_epoch_shuffle rule applied to negative sampling).  The
    ``+1 + hash %% (n-1)`` form makes the offset nonzero, so a negative
    can never alias the anchor.  Plan: the dense index comes from the
    two-phase distributed rank (quantile-bucketed ``row_number`` — no
    single-reducer window over the data-growing embedding table; the
    old global ``Window.orderBy`` form is exactly the class
    verify_round now gates), the row total is a 1-row aggregate
    broadcast back, the stride fan-out is a broadcast
    {_CONTRASTIVE_NEGS}-row spine, and both index joins shuffle on the
    integer index (AQE-skew-safe; no hot key exists by
    construction).  Rank-once, reuse per epoch in production."""
    from .dedup import materialized
    from .distrank import two_phase_row_number

    e = table(spark, sf_dir, "embeddings").select("vec_id")
    d = table(spark, sf_dir, "documents").select("doc_id")
    idx = materialized(
        two_phase_row_number(e, [], ["vec_id"], "_rn").select(
            "vec_id", (F.col("_rn") - 1).alias("ix")
        )
    )
    tot = idx.agg(F.count(F.lit(1)).alias("n"))
    anchors = (
        d.join(idx, d.doc_id == idx.vec_id)
        .join(F.broadcast(tot))
        .select("doc_id", "ix", "n")
    )
    spine = spark.range(1, _CONTRASTIVE_NEGS + 1).select(F.col("id").alias("j"))
    negpick = anchors.crossJoin(F.broadcast(spine)).select(
        "doc_id",
        "j",
        (
            (
                F.col("ix")
                + 1
                + (F.col("ix") * _CONTRASTIVE_STRIDE + F.col("j") * 40503)
                % (F.col("n") - 1)
            )
            % F.col("n")
        ).alias("neg_ix"),
    )
    resolve = idx.select(F.col("ix").alias("neg_ix"), F.col("vec_id").alias("neg_vec_id"))
    return negpick.join(resolve, "neg_ix").select(
        "doc_id",
        F.col("doc_id").alias("pos_vec_id"),
        F.col("j").cast("long").alias("neg_slot"),
        "neg_vec_id",
    )


# ------------------------------------------------ perceptual image dedup

#: pHash near-dup parameters: DCT input side, low-frequency block side
#: (8×8 → 64-bit hash), band split for the LSH join (4×16-bit bands —
#: a ≤10-bit-different pair always agrees on ≥1 band by pigeonhole
#: when its differing bits hit ≤3 bands; in practice near-dup
#: perturbations flip ≤4 bits), the Hamming accept threshold, and the
#: per-bucket candidate cap (the dedup_minhash_lsh mega-bucket rule:
#: a band value shared by thousands of flat/boilerplate images must
#: not go quadratic — those buckets are dropped and counted).
_PHASH_SIDE = 32
_PHASH_BLOCK = 8
_PHASH_BANDS = 4
_PHASH_MAX_HD = 10
_PHASH_BUCKET_CAP = 1000


def _dct_matrix(n: int):
    """Orthonormal DCT-II basis (numpy only; no scipy in the image)."""
    import numpy as np

    k = np.arange(n)[:, None]
    m = np.cos(np.pi * (2 * np.arange(n)[None, :] + 1) * k / (2 * n))
    t = m * np.sqrt(2.0 / n)
    t[0] *= 1.0 / np.sqrt(2.0)
    return t


def phash64(buf: bytes) -> int:
    """Classic pHash over a real BMP payload: decode → grayscale →
    nearest-neighbor resample to 32×32 → 2D orthonormal DCT (matrix
    form) → 8×8 low-frequency block → bit i set iff coefficient i
    exceeds the block median (DC included in the median but the
    median split keeps the hash DC-robust).  Returns a SIGNED 64-bit
    int (Spark LongType bit pattern)."""
    import numpy as np

    px = bmp_pixels(buf)  # (h, w, 3) uint8, raster order
    h, w = px.shape[0], px.shape[1]
    img = px.astype(np.float64).mean(axis=2)
    ys = (np.arange(_PHASH_SIDE) * h) // _PHASH_SIDE
    xs = (np.arange(_PHASH_SIDE) * w) // _PHASH_SIDE
    small = img[np.ix_(ys, xs)]
    t = _dct_matrix(_PHASH_SIDE)
    coef = t @ small @ t.T
    block = coef[:_PHASH_BLOCK, :_PHASH_BLOCK].ravel()
    med = float(np.median(block))
    bits = 0
    for i, c in enumerate(block):
        if float(c) > med:
            bits |= 1 << i
    if bits >= 1 << 63:  # two's-complement into LongType
        bits -= 1 << 64
    return bits


def _synth_neardup_bmp_iter(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Per document one REAL BMP; every doc_id ≡ 1 (mod 5) repeats the
    PREVIOUS doc's image with a 2-pixel perturbation — the planted
    near-dup pairs (doc_id-1, doc_id) the recall gate checks."""
    for pdf in batches:
        if not len(pdf):
            continue
        out = []
        for doc_id in pdf["doc_id"]:
            doc_id = int(doc_id)
            planted = doc_id % 5 == 1
            seed = doc_id - 1 if planted else doc_id
            w, h = 40 + seed % 24, 32 + (seed * 7) % 24

            def px(x, y, s=seed, pl=planted, w=w, h=h):
                # MIXED hash-noise pixels (multiply-shift avalanche,
                # not a per-seed XOR constant — an XOR'd constant makes
                # whole image FAMILIES near-identical in grayscale, a
                # false-positive factory): distinct seeds give
                # decorrelated noise whose pHashes differ in ~32 bits,
                # so only the planted pairs land under the threshold
                v = (x + 131 * y + 17161 * s) & 0xFFFFFFFF
                v = (v * 2654435761) & 0xFFFFFFFF
                v ^= v >> 15
                v = (v * 2246822519) & 0xFFFFFFFF
                v ^= v >> 13
                b, g, r = v % 256, (v >> 8) % 256, (v >> 16) % 256
                # the perturbation: two pixels nudged, not enough to
                # move more than a few DCT sign bits
                if pl and (x, y) in ((0, 0), (w - 1, h - 1)):
                    b = (b + 8) % 256
                return (b, g, r)

            out.append(
                {"doc_id": doc_id, "payload": encode_bmp(w, h, px)}
            )
        yield pd.DataFrame(out)


def _phash_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        if not len(pdf):
            continue
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "phash": [
                    phash64(bytes(p)) for p in pdf["payload"]
                ],
            }
        )


@query("multimodal_phash_near_dup")  # rows-only: binary codec + float DCT
def multimodal_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image NEAR-DUP detection end-to-end on REAL
    image bytes — the image-side twin of dedup_minhash_lsh and the
    missing rung of the multimodal dedup ladder (byte-identical dedup
    catches re-uploads; pHash catches re-encodes, slight crops, and
    pixel-level noise, which dominate scraped image corpora): synth a
    real BMP per document (docs ≡1 mod 5 repeat the previous doc's
    image with a 2-pixel perturbation — planted pairs), compute the
    classic 64-bit DCT pHash in one Arrow map stage (decode →
    32×32 nearest resample → orthonormal DCT → 8×8 block median
    bits), then find near pairs with the BANDED join discipline:
    4×16-bit bands, candidates share ≥1 band value, mega-buckets
    (> _PHASH_BUCKET_CAP members — boilerplate/flat images) dropped
    rather than joined, exact ``bit_count(xor)`` Hamming ≤
    _PHASH_MAX_HD verify on
    candidates only.  Never all-pairs: pair volume is Σ bucket², with
    buckets capped — the dedup_minhash_lsh scale shape on the image
    modality.  Rows-only by design (binary codec + float DCT have no
    SQL twin); the pytest gate pins planted-pair recall 1.0, no
    unplanted false positives at the threshold, and determinism."""
    d = table(spark, sf_dir, "documents").select("doc_id")
    payloads = d.mapInPandas(
        _synth_neardup_bmp_iter, "doc_id long, payload binary"
    )
    from .dedup import materialized

    # materialize: the banded self-join probes this frame from BOTH
    # sides (and the bucket-cap filter a third time) — without the
    # persist every path re-runs the Python decode+DCT stage
    hashes = materialized(
        payloads.mapInPandas(_phash_iter, "doc_id long, phash long")
    )
    bands = hashes.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_i"),
                        F.expr(
                            f"(phash >> {16 * i}) & 65535"
                        ).alias("band_v"),
                    )
                    for i in range(_PHASH_BANDS)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "phash", "b.band_i", "b.band_v")
    # mega-bucket guard: a band value shared by too many images would
    # make the candidate join quadratic in that bucket
    ok_buckets = (
        bands.groupBy("band_i", "band_v")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") <= _PHASH_BUCKET_CAP)
        .select("band_i", "band_v")
    )
    bands = bands.join(ok_buckets, ["band_i", "band_v"])
    a = bands.select(
        "band_i",
        "band_v",
        F.col("doc_id").alias("doc_a"),
        F.col("phash").alias("hash_a"),
    )
    b = bands.select(
        "band_i",
        "band_v",
        F.col("doc_id").alias("doc_b"),
        F.col("phash").alias("hash_b"),
    )
    cand = (
        a.join(b, ["band_i", "band_v"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "hash_a", "hash_b")
        .distinct()
    )
    return (
        cand.select(
            "doc_a",
            "doc_b",
            F.expr("bit_count(hash_a ^ hash_b)").cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= _PHASH_MAX_HD)
    )


# ------------------------------------------------ energy VAD on real WAV

#: VAD geometry and thresholds: 20 ms frames, 10 ms hop at 8 kHz (the
#: _AF_FRAME/_AF_HOP grid), enter/exit mean-square energies with
#: hysteresis (enter high, exit low — the events_hysteresis_alerts
#: rule applied to audio frames).
_VAD_ENTER = 1_000_000.0
_VAD_EXIT = 100_000.0


def vad_segments(samples) -> list:
    """Sequential energy VAD over int16 samples: frame mean-square
    energy on the 160/80 grid, two-threshold hysteresis (enter above
    _VAD_ENTER, leave below _VAD_EXIT), emitted as (start_frame,
    end_frame_exclusive, n_frames, peak_energy) segments.  Pure-python
    reference semantics; the Arrow kernel must match it exactly
    (pinned in tests/test_quality.py)."""
    segs = []
    in_speech = False
    start = 0
    peak = 0.0
    n_frames = max(0, (len(samples) - _AF_FRAME) // _AF_HOP + 1)
    for f in range(n_frames):
        w = samples[f * _AF_HOP : f * _AF_HOP + _AF_FRAME]
        e = sum(int(s) * int(s) for s in w) / len(w)
        if not in_speech and e > _VAD_ENTER:
            in_speech, start, peak = True, f, e
        elif in_speech:
            peak = max(peak, e)
            if e < _VAD_EXIT:
                segs.append((start, f, f - start, peak))
                in_speech = False
    if in_speech:
        segs.append((start, n_frames, n_frames - start, peak))
    return segs


def _synth_speech_wav_iter(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Per document one REAL WAV with planted speech bursts: quiet
    ±100 square-wave 'silence' with (doc_id % 3) loud ±8000 bursts at
    frame-aligned positions — docs ≡ 0 (mod 3) are all-silence."""
    for pdf in batches:
        if not len(pdf):
            continue
        out = []
        for doc_id in pdf["doc_id"]:
            doc_id = int(doc_id)
            n_bursts = doc_id % 3
            n_frames = 40 + doc_id % 10
            n = n_frames * _AF_HOP + _AF_FRAME
            samples = [100 if i % 2 == 0 else -100 for i in range(n)]
            for k in range(n_bursts):
                s_f = 5 + k * 15 + doc_id % 4  # frame-aligned start
                for i in range(s_f * _AF_HOP, (s_f + 6) * _AF_HOP):
                    samples[i] = 8000 if i % 2 == 0 else -8000
            out.append(
                {"doc_id": doc_id, "payload": encode_wav(8000, samples)}
            )
        yield pd.DataFrame(out)


def _vad_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        if not len(pdf):
            continue
        out = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            rate, samples = wav_samples(bytes(payload))
            x = np.asarray(samples, dtype=np.float64)
            n_frames = max(0, (len(x) - _AF_FRAME) // _AF_HOP + 1)
            if n_frames > 0:
                idx = (
                    np.arange(n_frames)[:, None] * _AF_HOP
                    + np.arange(_AF_FRAME)[None, :]
                )
                e = (x[idx] ** 2).mean(axis=1)
            else:
                e = np.empty(0)
            in_speech, start, peak = False, 0, 0.0
            for f in range(n_frames):
                if not in_speech and e[f] > _VAD_ENTER:
                    in_speech, start, peak = True, f, float(e[f])
                elif in_speech:
                    peak = max(peak, float(e[f]))
                    if e[f] < _VAD_EXIT:
                        out.append(
                            {
                                "doc_id": int(doc_id),
                                "seg_start": start,
                                "seg_end": f,
                                "n_frames": f - start,
                                "peak_energy": round(peak, 4),
                            }
                        )
                        in_speech = False
            if in_speech:
                out.append(
                    {
                        "doc_id": int(doc_id),
                        "seg_start": start,
                        "seg_end": n_frames,
                        "n_frames": n_frames - start,
                        "peak_energy": round(peak, 4),
                    }
                )
        yield pd.DataFrame(
            out,
            columns=[
                "doc_id", "seg_start", "seg_end", "n_frames", "peak_energy",
            ],
        )


@query("multimodal_wav_vad")  # rows-only: binary codec, sequential state
def multimodal_wav_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity detection over REAL WAV payloads — the audio
    curation primitive that decides which stretches of a recording are
    worth transcribing/training on (dead air dominates raw audio the
    way boilerplate dominates raw HTML): decode PCM16, frame on the
    standard 20 ms/10 ms grid, mean-square energy per frame, and a
    TWO-THRESHOLD hysteresis state machine (enter loud, exit only when
    quiet — single-threshold VAD chatters on boundary frames; this is
    events_hysteresis_alerts' rule on the audio axis) emitting speech
    segments with frame bounds and peak energy.  Docs carry planted
    frame-aligned bursts (doc_id % 3 of them), so the pytest gate
    checks exact segment recovery and pins the Arrow kernel against
    the sequential pure-python reference ``vad_segments``.  Plan: two
    zero-shuffle Arrow map stages (synth, then decode+VAD); per-doc
    state is one (in_speech, start, peak) triple — embarrassingly
    parallel at any corpus size."""
    d = table(spark, sf_dir, "documents").select("doc_id")
    payloads = d.mapInPandas(
        _synth_speech_wav_iter, "doc_id long, payload binary"
    )
    return payloads.mapInPandas(
        _vad_iter,
        "doc_id long, seg_start int, seg_end int, n_frames int, "
        "peak_energy double",
    )
