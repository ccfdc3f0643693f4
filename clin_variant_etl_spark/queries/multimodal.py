"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
decoded/feature-extracted via Arrow-batched ``mapInPandas``.

The image/audio codecs are NOT available in this environment, so the decode
step is a clearly-marked deterministic STUB (`_stub_decode`): it derives fake
"media features" (dimensions, checksum) purely from the bytes, so the
Spark-side plumbing — binary schema, Arrow batch shape, partition-parallel
UDF execution — is real and oracle-checkable, while a production deployment
would swap `_stub_decode` for PIL/ffmpeg calls (kept behind the same
signature; see `decode_real` which raises NotImplementedError).

Reference analogue: the per-partition external-processing pattern
(etl/varsome/Varsome.scala:81-97 mapPartitions → here mapInPandas, I2→I3).
"""

from __future__ import annotations

from pyspark.sql import functions as F, types as T

from .registry import load, query

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("fake_width", T.LongType()),
        T.StructField("fake_height", T.LongType()),
    ]
)


def decode_real(payload: bytes) -> dict:
    """Production decode hook (PIL / ffmpeg).  Not available in this env."""
    raise NotImplementedError("media codecs not installed; use the stub decode path")


def repartition_for_external_batches(df, rows_per_batch: int = 1000):
    """Count-derived partitioning (SURVEY §2 F3): size partitions so each
    external-service call (codec pool, HTTP API) sees ≤ rows_per_batch rows —
    the reference batches Varsome HTTP calls at 1000 loci/partition
    (etl/varsome/Varsome.scala:83-88, numPartitions = count/1000 + 1).
    Costs one count job; only used on frames headed to an external boundary.
    """
    n = df.count()
    n_parts = max(1, -(-n // rows_per_batch))
    return df.repartition(n_parts)


@query(
    "multimodal_decode_features",
    oracle="""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       md5(text) AS content_md5,
       CAST(('0x' || substr(md5(text), 1, 2)) AS BIGINT) AS fake_width,
       CAST(('0x' || substr(md5(text), 3, 2)) AS BIGINT) AS fake_height
FROM documents
""",
    survey="multimodal-decode,I2,I3,A10",
    gate=False,  # rotated out r5: driver rows green r1-r4; codes stay gate-covered
)
def multimodal_decode_features(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    # binary payload column: utf-8 bytes of the text stand in for media bytes
    media = d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )
    # codec-pool batch sizing, the reference's HTTP-batch pattern (F3/A10)
    media = repartition_for_external_batches(media, rows_per_batch=1000)

    # the decode fn is fully self-contained (defined locally → cloudpickle
    # serializes it by value, so executors never need this repo on sys.path)
    def decode(batches):
        import hashlib as _hl

        import pandas as _pd

        for pdf in batches:
            payload = pdf["payload"]
            md5s = payload.map(lambda b: _hl.md5(b).hexdigest())
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": payload.map(len).astype("int64"),
                    "content_md5": md5s,
                    # fake dimensions from the first md5 hex bytes — the
                    # deterministic STUB for the unavailable media codecs
                    "fake_width": md5s.str.slice(0, 2).map(lambda h: int(h, 16)).astype("int64"),
                    "fake_height": md5s.str.slice(2, 4).map(lambda h: int(h, 16)).astype("int64"),
                }
            )

    return media.mapInPandas(decode, schema=MEDIA_SCHEMA)


@query(
    "multimodal_wav_decode",
    oracle="""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(1 AS BIGINT) AS n_channels,
       CAST(2 AS BIGINT) AS sample_width,
       CAST(8000 AS BIGINT) AS framerate,
       CAST(length(text) AS BIGINT) AS n_frames,
       CAST(list_max(list_transform(generate_series(1, length(text)),
              i -> abs((ascii(substr(text, i, 1)) % 256 - 128) * 256)))
            AS BIGINT) AS peak_amplitude,
       CAST(list_sum(list_transform(generate_series(1, length(text)),
              i -> abs((ascii(substr(text, i, 1)) % 256 - 128) * 256)))
            AS BIGINT) AS sum_abs_amplitude
FROM documents
WHERE length(text) >= 1
""",
    survey="A10,I2,I3,multimodal-decode",
    # gated since r4 (rotation: never driver-checked in r1-r3)
)
def multimodal_wav_decode(spark, sf_dir):
    """REAL codec decode through the A10 plumbing — no stub.

    Each document's chars become PCM16 mono samples in a genuine RIFF/WAVE
    container (44-byte header + frames), and the decode side REALLY parses
    it with stdlib ``wave``: channel count, sample width, frame rate and
    frame count come out of the RIFF header, amplitude stats out of the
    decoded frames (numpy over the raw PCM buffer — Arrow-batched, zero
    per-row Python beyond the codec boundary itself, which is exactly the
    per-partition external-processing shape of the reference's Varsome path,
    etl/varsome/Varsome.scala:81-97).  Image/video codecs stay behind
    ``decode_real`` (PIL/ffmpeg absent here), but the audio path exercises a
    true encode→binary→parse round trip, so the A10 contract — opaque binary
    column in, typed features out, count-derived ≤1000-row batches — is
    verified against a DuckDB oracle with no fake step in the loop.
    """
    d = load(spark, sf_dir, "documents")
    docs = d.select(F.col("doc_id").cast("long").alias("doc_id"), "text").where(
        F.length("text") >= 1
    )
    docs = repartition_for_external_batches(docs, rows_per_batch=1000)

    def encode_decode(batches):
        import io as _io
        import wave as _wave

        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            out = {
                "doc_id": [],
                "n_channels": [],
                "sample_width": [],
                "framerate": [],
                "n_frames": [],
                "peak_amplitude": [],
                "sum_abs_amplitude": [],
            }
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                # encode: chars → int16 PCM mono @8kHz in a real WAV container
                samples = (
                    _np.frombuffer(
                        text.encode("utf-32-le"), dtype="<u4"
                    ).astype(_np.int64)
                    % 256
                    - 128
                ) * 256
                buf = _io.BytesIO()
                with _wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(8000)
                    w.writeframes(samples.astype("<i2").tobytes())
                payload = buf.getvalue()

                # decode: REAL RIFF/WAVE parse of the opaque payload
                with _wave.open(_io.BytesIO(payload), "rb") as r:
                    nch, sw, fr, nf = (
                        r.getnchannels(),
                        r.getsampwidth(),
                        r.getframerate(),
                        r.getnframes(),
                    )
                    pcm = _np.frombuffer(r.readframes(nf), dtype="<i2").astype(
                        _np.int64
                    )
                amp = _np.abs(pcm)
                out["doc_id"].append(doc_id)
                out["n_channels"].append(nch)
                out["sample_width"].append(sw)
                out["framerate"].append(fr)
                out["n_frames"].append(nf)
                out["peak_amplitude"].append(int(amp.max()) if nf else 0)
                out["sum_abs_amplitude"].append(int(amp.sum()))
            yield _pd.DataFrame(out)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_channels", T.LongType()),
            T.StructField("sample_width", T.LongType()),
            T.StructField("framerate", T.LongType()),
            T.StructField("n_frames", T.LongType()),
            T.StructField("peak_amplitude", T.LongType()),
            T.StructField("sum_abs_amplitude", T.LongType()),
        ]
    )
    return docs.mapInPandas(encode_decode, schema=schema)


@query(
    "multimodal_frame_sample",
    oracle="""
WITH m AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, strlen(text) AS n_bytes FROM documents
)
SELECT doc_id,
       CAST(n_bytes // 100 AS BIGINT) AS n_frames,
       CAST(list_reduce(list_prepend(0, list_transform(
              generate_series(0, CAST(n_bytes // 100 AS BIGINT) - 1), i -> i * 100)),
            (a, b) -> a + b) AS BIGINT) AS sum_frame_offsets
FROM m
WHERE n_bytes >= 100
""",
    survey="multimodal-framesample,H-array,B2",
    # gated since r4 (rotation: never driver-checked in r1-r3)
)
def multimodal_frame_sample(spark, sf_dir):
    """Frame-sampling plumbing: compute per-'video' frame offsets (every 100
    bytes) as an array column — the partition/batch shape a real frame
    extractor would consume."""
    d = load(spark, sf_dir, "documents")
    n_bytes = F.octet_length(F.col("text"))
    n_frames = F.floor(n_bytes / 100).cast("long")
    offsets = F.transform(
        F.sequence(F.lit(0), (n_frames - 1).cast("int")), lambda i: i * 100
    )
    return (
        d.select(F.col("doc_id").cast("long").alias("doc_id"), n_frames.alias("n_frames"), offsets.alias("o"))
        .where(F.col("n_frames") >= 1)
        .select(
            "doc_id",
            "n_frames",
            F.aggregate(F.col("o"), F.lit(0), lambda a, b: a + b).cast("long").alias(
                "sum_frame_offsets"
            ),
        )
    )


@query(
    "multimodal_bmp_decode",
    oracle="""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(5 AS BIGINT) AS width,
       CAST((length(text) + 4) // 5 AS BIGINT) AS height,
       CAST(24 AS BIGINT) AS bpp,
       CAST(5 * ((length(text) + 4) // 5) AS BIGINT) AS n_pixels,
       CAST(list_sum(list_transform(generate_series(1, length(text)),
              i -> ascii(substr(text, i, 1)) % 256)) AS BIGINT) AS sum_lum,
       CAST(list_max(list_transform(generate_series(1, length(text)),
              i -> ascii(substr(text, i, 1)) % 256)) AS BIGINT) AS max_lum
FROM documents
WHERE length(text) >= 1
""",
    survey="A10,I2,I3,multimodal-decode",
)
def multimodal_bmp_decode(spark, sf_dir):
    """REAL image codec decode through the A10 plumbing — no stub.

    The WAV sibling proved the audio path; this does the same for images
    with the one raster format fully decodable from the stdlib: each
    document's chars become grayscale pixels in a genuine 24-bit
    uncompressed BMP (BITMAPFILEHEADER + BITMAPINFOHEADER + bottom-up
    4-byte-aligned rows — width 5 gives a 15-byte row padded to 16, so the
    stride logic is actually exercised), and the decode side REALLY parses
    the container: magic, pixel-array offset, dimensions, bit depth and
    compression come out of the headers via ``struct.unpack``; luminance
    stats out of the strided pixel rows via numpy.  The zero pixels padding
    the final row are real pixels of the image and are included in the
    stats (they contribute 0 to the sum and never win the max because text
    codepoints are ≥1), which is what the oracle computes from the text.
    PIL/ffmpeg formats stay behind ``decode_real``.
    """
    d = load(spark, sf_dir, "documents")
    docs = d.select(F.col("doc_id").cast("long").alias("doc_id"), "text").where(
        F.length("text") >= 1
    )
    docs = repartition_for_external_batches(docs, rows_per_batch=1000)
    WIDTH = 5

    def encode_decode(batches):
        import struct as _struct

        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            out = {
                "doc_id": [], "width": [], "height": [], "bpp": [],
                "n_pixels": [], "sum_lum": [], "max_lum": [],
            }
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                # encode: chars -> grayscale pixels in a real 24-bit BMP
                vals = (
                    _np.frombuffer(text.encode("utf-32-le"), dtype="<u4")
                    % 256
                ).astype(_np.uint8)
                h = -(-len(vals) // WIDTH)
                grid = _np.zeros((h, WIDTH), dtype=_np.uint8)
                grid.ravel()[: len(vals)] = vals
                stride = ((WIDTH * 3 + 3) // 4) * 4
                rows = b"".join(
                    _np.repeat(grid[r], 3).tobytes().ljust(stride, b"\x00")
                    for r in range(h - 1, -1, -1)  # bottom-up
                )
                header = _struct.pack(
                    "<2sIHHI", b"BM", 14 + 40 + len(rows), 0, 0, 14 + 40
                ) + _struct.pack(
                    "<IiiHHIIiiII", 40, WIDTH, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0
                )
                payload = header + rows

                # decode: REAL container parse of the opaque payload
                magic, _, _, _, off = _struct.unpack_from("<2sIHHI", payload, 0)
                assert magic == b"BM"
                (_, w, ih, _, bpp, comp) = _struct.unpack_from("<IiiHHI", payload, 14)
                assert bpp == 24 and comp == 0
                st = ((w * 3 + 3) // 4) * 4
                pix = _np.stack(
                    [
                        _np.frombuffer(payload, _np.uint8, w * 3, off + r * st)
                        .reshape(w, 3)
                        for r in range(ih - 1, -1, -1)
                    ]
                )
                lum = pix[:, :, 0].astype(_np.int64)  # grayscale: B==G==R
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(ih)
                out["bpp"].append(int(bpp))
                out["n_pixels"].append(w * ih)
                out["sum_lum"].append(int(lum.sum()))
                out["max_lum"].append(int(lum.max()))
            yield _pd.DataFrame(out)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("width", T.LongType()),
            T.StructField("height", T.LongType()),
            T.StructField("bpp", T.LongType()),
            T.StructField("n_pixels", T.LongType()),
            T.StructField("sum_lum", T.LongType()),
            T.StructField("max_lum", T.LongType()),
        ]
    )
    return docs.mapInPandas(encode_decode, schema=schema)


@query(
    "multimodal_png_decode",
    oracle="""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(5 AS BIGINT) AS width,
       CAST((length(text) + 4) // 5 AS BIGINT) AS height,
       CAST(8 AS BIGINT) AS bit_depth,
       CAST(5 * ((length(text) + 4) // 5) AS BIGINT) AS n_pixels,
       CAST(list_sum(list_transform(generate_series(1, length(text)),
              i -> ascii(substr(text, i, 1)) % 256)) AS BIGINT) AS sum_lum,
       CAST(list_max(list_transform(generate_series(1, length(text)),
              i -> ascii(substr(text, i, 1)) % 256)) AS BIGINT) AS max_lum
FROM documents
WHERE length(text) >= 1
""",
    survey="A10,I2,I3,multimodal-decode",
)
def multimodal_png_decode(spark, sf_dir):
    """REAL *compressed* image codec through the A10 plumbing.

    BMP proved the raster container parse; PNG adds the full compressed
    pipeline, stdlib-only: chunked container (length/type/payload/CRC32),
    DEFLATE via ``zlib``, and per-row scanline filters.  The encoder writes
    8-bit grayscale with every row Sub-filtered (type 1 — a real delta
    predictor, so the decoder cannot shortcut to a memcpy) and a verified
    CRC32 on every chunk; the decoder REALLY inflates: signature check,
    IHDR parse, CRC verification of each chunk, IDAT concatenation (the
    encoder splits IDAT in two to exercise multi-chunk streams),
    ``zlib.decompress``, and generic type-0..4 unfiltering (None/Sub/Up/
    Average/Paeth — the spec's full filter set, not just the one the
    encoder used).  Same luminance oracle as the BMP sibling: the zero
    pixels padding the last row are real pixels and count in the stats.
    PIL/ffmpeg formats stay behind ``decode_real``.
    """
    d = load(spark, sf_dir, "documents")
    docs = d.select(F.col("doc_id").cast("long").alias("doc_id"), "text").where(
        F.length("text") >= 1
    )
    docs = repartition_for_external_batches(docs, rows_per_batch=1000)
    WIDTH = 5

    def encode_decode(batches):
        import struct as _struct
        import zlib as _zlib

        import numpy as _np
        import pandas as _pd

        def chunk(ctype: bytes, payload: bytes) -> bytes:
            return (
                _struct.pack(">I", len(payload))
                + ctype
                + payload
                + _struct.pack(">I", _zlib.crc32(ctype + payload))
            )

        def unfilter(raw: bytes, w: int, h: int) -> "_np.ndarray":
            # bpp=1 (8-bit grayscale): a = left, b = up, c = upper-left
            out = _np.zeros((h, w), dtype=_np.int64)
            pos = 0
            for r in range(h):
                ft = raw[pos]
                line = _np.frombuffer(raw, _np.uint8, w, pos + 1).astype(_np.int64)
                pos += 1 + w
                up = out[r - 1] if r else _np.zeros(w, dtype=_np.int64)
                if ft == 0:
                    out[r] = line
                elif ft == 2:  # Up
                    out[r] = (line + up) % 256
                else:  # Sub/Average/Paeth need the running left pixel
                    for x in range(w):
                        a = out[r, x - 1] if x else 0
                        b, c = up[x], (up[x - 1] if x else 0)
                        if ft == 1:
                            pred = a
                        elif ft == 3:
                            pred = (a + b) // 2
                        else:  # Paeth
                            p = a + b - c
                            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                            pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                        out[r, x] = (line[x] + pred) % 256
            return out

        for pdf in batches:
            out = {
                "doc_id": [], "width": [], "height": [], "bit_depth": [],
                "n_pixels": [], "sum_lum": [], "max_lum": [],
            }
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                vals = (
                    _np.frombuffer(text.encode("utf-32-le"), dtype="<u4") % 256
                ).astype(_np.uint8)
                h = -(-len(vals) // WIDTH)
                grid = _np.zeros((h, WIDTH), dtype=_np.uint8)
                grid.ravel()[: len(vals)] = vals
                # Sub-filter every scanline: raw[x] - raw[x-1] mod 256
                scan = b"".join(
                    b"\x01"
                    + _np.diff(grid[r].astype(_np.int64), prepend=0).astype(
                        _np.uint8
                    ).tobytes()
                    for r in range(h)
                )
                z = _zlib.compress(scan)
                ihdr = _struct.pack(">IIBBBBB", WIDTH, h, 8, 0, 0, 0, 0)
                payload = (
                    b"\x89PNG\r\n\x1a\n"
                    + chunk(b"IHDR", ihdr)
                    + chunk(b"IDAT", z[: len(z) // 2])  # multi-chunk IDAT
                    + chunk(b"IDAT", z[len(z) // 2 :])
                    + chunk(b"IEND", b"")
                )

                # decode: REAL compressed-container parse of the payload
                assert payload[:8] == b"\x89PNG\r\n\x1a\n"
                pos, idat, w, ih = 8, b"", 0, 0
                while pos < len(payload):
                    (ln,) = _struct.unpack_from(">I", payload, pos)
                    ctype = payload[pos + 4 : pos + 8]
                    body = payload[pos + 8 : pos + 8 + ln]
                    (crc,) = _struct.unpack_from(">I", payload, pos + 8 + ln)
                    assert crc == _zlib.crc32(ctype + body), "PNG chunk CRC mismatch"
                    if ctype == b"IHDR":
                        w, ih, depth, ctyp = _struct.unpack_from(">IIBB", body, 0)
                        assert depth == 8 and ctyp == 0
                    elif ctype == b"IDAT":
                        idat += body
                    pos += 12 + ln
                pix = unfilter(_zlib.decompress(idat), w, ih)
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(ih)
                out["bit_depth"].append(8)
                out["n_pixels"].append(w * ih)
                out["sum_lum"].append(int(pix.sum()))
                out["max_lum"].append(int(pix.max()))
            yield _pd.DataFrame(out)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("width", T.LongType()),
            T.StructField("height", T.LongType()),
            T.StructField("bit_depth", T.LongType()),
            T.StructField("n_pixels", T.LongType()),
            T.StructField("sum_lum", T.LongType()),
            T.StructField("max_lum", T.LongType()),
        ]
    )
    return docs.mapInPandas(encode_decode, schema=schema)
