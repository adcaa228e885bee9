"""Multimodal column handling (north_star "multimodal columns").

Pattern: media (image/audio/video) lives as an opaque ``binary`` column +
a typed metadata struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` over partition-sized batches. The decode libraries are not
in this container (SURVEY.md §7 hard-parts #6), so the decoder is a
deterministic fake behind a try-import — but the Spark-side plumbing
(schema, binary payloads, batch iteration, partitioning) is real and
oracle/test-checked.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_gnn_spark.functions.arrays import dot_expr
from flink_streaming_gnn_spark.sources.tables import load_table


def multimodal_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text + vector + metadata in one relation: documents ⋈ embeddings on
    doc_id = vec_id, with a derived vector norm (FIXTURES.md multimodal
    fixture)."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    return d.join(e, d.doc_id == e.vec_id).select(
        "doc_id",
        "lang",
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("label").cast("long").alias("label"),
        F.round(F.sqrt(F.expr(dot_expr("embedding", "embedding"))), 4).alias("emb_norm"),
    )


def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary payload + typed metadata, end to end JVM-side:
    utf-8 encode the text as the stand-in media blob, carry byte length
    and an md5 content address — the schema shape a real image/audio
    column uses (payload bytes + content hash + size)."""
    d = load_table(spark, sf_dir, "documents")
    blob = F.encode("text", "utf-8")
    return d.select(
        "doc_id",
        F.length(blob).cast("long").alias("byte_len"),
        F.md5(blob).alias("content_md5"),
        F.substring("text", 1, 16).alias("head"),
    )


# deterministic fake "decode": real decoders are not installed in this image
try:  # pragma: no cover - the real path needs PIL/av/librosa
    import PIL.Image  # noqa: F401

    _HAS_DECODER = True
except ImportError:
    _HAS_DECODER = False


def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media decode / feature-extract plumbing over ``mapInPandas``:
    binary in → (doc_id, width, height, n_frames, mean_luma) out.

    The batch shape, schema contract and partitioning are production-real;
    only the innermost decode call is faked (first bytes of the blob drive
    deterministic pseudo-dimensions). With PIL/av installed the fake body
    is replaced by the real decoder — the operator and plan don't change.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if _HAS_DECODER:
                raise NotImplementedError(
                    "real decoder path not exercised in this container"
                )
            blobs = pdf["media"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": blobs.map(lambda b: 64 + b[0] % 64),
                    "height": blobs.map(lambda b: 64 + b[1] % 64),
                    "n_frames": blobs.map(lambda b: 1 + b[2] % 8),
                    "mean_luma": blobs.map(lambda b: round(sum(b[:16]) / 16.0, 2)),
                }
            )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("media")
    )
    return d.mapInPandas(
        decode_batches,
        "doc_id long, width long, height long, n_frames long, mean_luma double",
    )


def ppm_decode(blob: bytes):
    """REAL P6 PPM decode, no imaging library: parse the ASCII header
    (magic, width, height, maxval — comments skipped per spec), then view
    the raw RGB payload as (h, w, 3) uint8. Works on any binary PPM file,
    not just the synthetic ones below."""
    import numpy as np

    if not blob.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    fields: list[int] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(blob) and blob[pos : pos + 1].isspace():
            pos += 1
        if blob[pos : pos + 1] == b"#":  # comment runs to end of line
            while pos < len(blob) and blob[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(blob[start:pos]))
    pos += 1  # single whitespace after maxval, then raw pixels
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    return np.frombuffer(blob, dtype=np.uint8, count=w * h * 3, offset=pos).reshape(
        h, w, 3
    )


def multimodal_ppm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media decode with a REAL format parser — the upgrade of
    ``multimodal_decode_stub``'s faked innermost call: each asset is an
    actual binary P6 PPM image (header + raw RGB), decoded by
    ``ppm_decode`` (a genuine parser that handles any PPM file), then
    reduced to per-channel means + luma. Only the *camera* is synthetic —
    pixel (y, x, c) = (doc_id + 3y + 5x + 11c) mod 256 with per-doc
    irregular dimensions — which is exactly what makes the whole
    decode path oracle-checkable: DuckDB recomputes the same statistics
    from the pixel formula, so a parser bug (header off-by-one, stride
    error, channel swap) breaks the hash.

    Plan shape: one Arrow-batched ``mapInPandas`` over the corpus — the
    encode/decode runs where the data lives, no shuffle; output is one
    row per asset."""
    import types

    # ship the parser BY VALUE: a module-level function pickles by
    # reference (workers driven from a foreign cwd can't import this
    # package — the driver_sim gotcha), so rebuild it as a dynamic
    # function cloudpickle serializes whole. ppm_decode only uses
    # builtins + a local numpy import, so empty globals suffice.
    parse_ppm = types.FunctionType(
        ppm_decode.__code__, {"__builtins__": __builtins__}, "parse_ppm"
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        out_rows: list[dict] = []
        for pdf in batches:
            out_rows.clear()
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w, h = 8 + doc_id % 9, 8 + doc_id % 7
                y, x, c = np.ogrid[0:h, 0:w, 0:3]
                px = ((doc_id + 3 * y + 5 * x + 11 * c) % 256).astype(np.uint8)
                blob = b"P6\n# synthetic camera\n%d %d\n255\n" % (w, h) + px.tobytes()
                img = parse_ppm(blob)  # the REAL parser under test
                n = w * h
                means = [float(img[:, :, ch].sum()) / n for ch in range(3)]
                out_rows.append(
                    {
                        "doc_id": doc_id,
                        "width": w,
                        "height": h,
                        "mean_r": round(means[0], 4),
                        "mean_g": round(means[1], 4),
                        "mean_b": round(means[2], 4),
                        "mean_luma": round(
                            0.299 * means[0] + 0.587 * means[1] + 0.114 * means[2], 4
                        ),
                    }
                )
            yield pd.DataFrame(out_rows)

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(
        decode_batches,
        "doc_id long, width long, height long, "
        "mean_r double, mean_g double, mean_b double, mean_luma double",
    )


def wav_decode(blob: bytes):
    """REAL RIFF/WAVE decode, no audio library: verify the RIFF container,
    walk the chunk list (any order, unknown chunks skipped per spec), read
    the fmt chunk (PCM, mono, 16-bit enforced) and view the data chunk as
    int16 samples. Works on any standard PCM WAV file."""
    import struct

    import numpy as np

    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, bits, channels, samples = 12, None, None, None, None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        (size,) = struct.unpack("<I", blob[pos + 4 : pos + 8])
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt, channels, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if fmt != 1:
                raise ValueError("only PCM supported")
        elif cid == b"data":
            if bits != 16 or channels != 1:
                raise ValueError("only 16-bit mono supported")
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt or data chunk")
    return rate, samples


SAMPLE_RATE = 16_000


def multimodal_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio twin of ``multimodal_ppm_decode``: each asset is an actual
    RIFF/WAVE file (16 kHz mono PCM16) built by a synthetic microphone —
    sample[i] = ((doc_id·13 + i·7) mod 65536) − 32768 — decoded by
    ``wav_decode`` (a genuine chunk-walking RIFF parser), then reduced to
    duration / RMS / peak. The oracle recomputes the same statistics from
    the sample formula, so a parser bug (chunk offset, endianness, width)
    breaks the hash. One Arrow mapInPandas, no shuffle."""
    import types

    parse_wav = types.FunctionType(
        wav_decode.__code__, {"__builtins__": __builtins__}, "parse_wav"
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        rows: list[dict] = []
        for pdf in batches:
            rows.clear()
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                n = 160 + (doc_id % 7) * 80
                i = np.arange(n)
                pcm = (((doc_id * 13 + i * 7) % 65536) - 32768).astype("<i2")
                data = pcm.tobytes()
                fmt = struct.pack("<HHIIHH", 1, 1, SAMPLE_RATE, SAMPLE_RATE * 2, 2, 16)
                blob = (
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
                rate, samples = parse_wav(blob)  # the REAL parser under test
                s = samples.astype(np.float64)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "sample_rate": rate,
                        "n_samples": len(samples),
                        "duration_ms": len(samples) * 1000 // rate,
                        "rms": round(float(np.sqrt((s * s).sum() / len(s))), 4),
                        "peak": int(np.abs(samples.astype(np.int64)).max()),
                    }
                )
            yield pd.DataFrame(rows)

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(
        decode_batches,
        "doc_id long, sample_rate long, n_samples long, duration_ms long, "
        "rms double, peak long",
    )


FRAME_SLOTS = 4
FPS = 24


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic video frame sampling plan: given per-asset metadata
    (duration derived deterministically from doc_id here; a real pipeline
    reads it from the probe/metadata struct), pick {FRAME_SLOTS} evenly
    spaced frame indices per asset and emit one row per (asset, slot) with
    the frame index and its timestamp — the exact explode the real
    frame-extraction mapInPandas (multimodal_decode_stub's shape) consumes.
    All integer arithmetic (div), no floats: every engine agrees exactly."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    d = d.withColumn("duration_s", (1 + F.pmod("doc_id", F.lit(30))).cast("long"))
    d = d.withColumn("n_frames", (F.col("duration_s") * FPS).cast("long"))
    slots = d.select(
        "doc_id",
        "n_frames",
        F.explode(F.sequence(F.lit(0), F.lit(FRAME_SLOTS - 1))).alias("slot"),
    )
    return slots.select(
        "doc_id",
        F.col("slot").cast("long").alias("slot"),
        F.expr(f"(slot * (n_frames - 1)) div {FRAME_SLOTS - 1}").alias("frame_idx"),
        F.expr(
            f"((slot * (n_frames - 1)) div {FRAME_SLOTS - 1}) * 1000 div {FPS}"
        ).alias("ts_ms"),
    )


CHUNK_MS = 30_000  # 30 s audio windows
HOP_MS = 25_000  # 5 s overlap


def multimodal_audio_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic audio segmentation plan: per-asset duration (derived
    from doc_id; a real pipeline reads the container metadata struct) cut
    into 30 s windows with 5 s overlap — one row per (asset, chunk) with
    start/end ms and the sample span at 16 kHz. The chunk explode is the
    exact shape the streaming-ASR / audio-embedding mapInPandas consumes
    (multimodal_decode_stub's contract); zero shuffle, all integer
    arithmetic."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    d = d.withColumn(
        "duration_ms", ((5 + F.pmod("doc_id", F.lit(120))) * 1000).cast("long")
    )
    n_chunks = F.expr(
        f"greatest(1, (duration_ms - {CHUNK_MS} + {HOP_MS} - 1) div {HOP_MS} + 1)"
    )
    chunks = d.select(
        "doc_id",
        "duration_ms",
        F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias("chunk"),
    )
    start = F.col("chunk") * HOP_MS
    end = F.least(start + CHUNK_MS, F.col("duration_ms"))
    return chunks.select(
        "doc_id",
        F.col("chunk").cast("long").alias("chunk"),
        start.cast("long").alias("start_ms"),
        end.cast("long").alias("end_ms"),
        (start * 16).cast("long").alias("start_sample"),
        (end * 16).cast("long").alias("end_sample"),
    )


TILE = 224  # ViT-style patch window


def multimodal_image_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic image tiling plan: per-asset (width, height) metadata
    (derived from doc_id here; a real pipeline reads the decoded header
    struct) cut into a TILE×TILE grid with edge tiles clamped — one row
    per (asset, row, col) with pixel bounds, the exact explode a
    vision-encoder mapInPandas (multimodal_decode_stub's contract)
    consumes. Zero shuffle, all integer arithmetic."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    d = d.withColumn("w", (256 + F.pmod("doc_id", F.lit(8)) * 128).cast("long"))
    d = d.withColumn("h", (256 + F.pmod("doc_id", F.lit(5)) * 128).cast("long"))
    d = d.withColumn("n_cols", F.expr(f"(w + {TILE} - 1) div {TILE}"))
    d = d.withColumn("n_rows", F.expr(f"(h + {TILE} - 1) div {TILE}"))
    grid = d.select(
        "doc_id",
        "w",
        "h",
        F.explode(F.sequence(F.lit(0), F.col("n_rows") - 1)).alias("tile_row"),
        "n_cols",
    ).select(
        "doc_id",
        "w",
        "h",
        "tile_row",
        F.explode(F.sequence(F.lit(0), F.col("n_cols") - 1)).alias("tile_col"),
    )
    return grid.select(
        "doc_id",
        F.col("tile_row").cast("long").alias("tile_row"),
        F.col("tile_col").cast("long").alias("tile_col"),
        (F.col("tile_col") * TILE).cast("long").alias("x0"),
        (F.col("tile_row") * TILE).cast("long").alias("y0"),
        F.least(F.col("tile_col") * TILE + TILE, F.col("w")).cast("long").alias("x1"),
        F.least(F.col("tile_row") * TILE + TILE, F.col("h")).cast("long").alias("y1"),
    )


def multimodal_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual average-hash (aHash) fingerprints over the synthetic
    PPM camera — the image analogue of ``dedup_simhash``: decode each
    asset with the REAL ``ppm_decode`` parser, sample an 8×8 integer
    luma grid (pixel (⌊i·h/8⌋, ⌊j·w/8⌋), pure integer indexing — no
    resampling kernel to disagree on), and set bit (i,j) iff the sample
    is brighter than the grid average. The mean comparison is kept in
    integers (64·L > ΣL with L = 299R+587G+114B) so the 64-bit
    fingerprint is EXACT — the oracle recomputes every bit from the
    pixel formula and a parser/stride/channel bug flips the hash.

    This is the standard near-duplicate *image* dedup primitive: at
    100 TB the emitted fingerprints feed the same banded-Hamming
    candidate join as ``dedup_simhash``/``simsearch_binary_hamming``.
    Plan: one Arrow-batched ``mapInPandas``, no shuffle, one row per
    asset."""
    import types

    parse_ppm = types.FunctionType(
        ppm_decode.__code__, {"__builtins__": __builtins__}, "parse_ppm"
    )

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows: list[dict] = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                w, h = 8 + doc_id % 9, 8 + doc_id % 7
                y, x, c = np.ogrid[0:h, 0:w, 0:3]
                px = ((doc_id + 3 * y + 5 * x + 11 * c) % 256).astype(np.uint8)
                blob = b"P6\n# synthetic camera\n%d %d\n255\n" % (w, h) + px.tobytes()
                img = parse_ppm(blob).astype(np.int64)
                ys = (np.arange(8) * h) // 8
                xs = (np.arange(8) * w) // 8
                grid = img[np.ix_(ys, xs)]
                luma = 299 * grid[:, :, 0] + 587 * grid[:, :, 1] + 114 * grid[:, :, 2]
                total = int(luma.sum())
                bits = (64 * luma > total).astype(int).ravel()  # row-major
                rows.append(
                    {
                        "doc_id": doc_id,
                        "width": w,
                        "height": h,
                        "ahash_bits": "".join(map(str, bits)),
                        "n_set_bits": int(bits.sum()),
                    }
                )
            yield pd.DataFrame(rows)

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(
        hash_batches,
        "doc_id long, width long, height long, ahash_bits string, n_set_bits long",
    )


QUERIES = {
    "multimodal_image_ahash": multimodal_image_ahash,
    "multimodal_ppm_decode": multimodal_ppm_decode,
    "multimodal_wav_decode": multimodal_wav_decode,
    "multimodal_image_tiles": multimodal_image_tiles,
    "multimodal_cols": multimodal_cols,
    "multimodal_audio_chunk": multimodal_audio_chunk,
    "multimodal_binary_meta": multimodal_binary_meta,
    "multimodal_decode_stub": multimodal_decode_stub,
    "multimodal_frame_sample": multimodal_frame_sample,
}

ORACLE = {
    "multimodal_image_ahash": """
        WITH meta AS (
            SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
            FROM documents
        ),
        grid AS (
            SELECT doc_id, w, h, i.i AS i, j.j AS j,
                   (i.i * h) // 8 AS ys,
                   (j.j * w) // 8 AS xs
            FROM meta,
                 LATERAL (SELECT unnest(generate_series(0, 7)) AS i) i,
                 LATERAL (SELECT unnest(generate_series(0, 7)) AS j) j
        ),
        luma AS (
            SELECT doc_id, w, h, i, j,
                   299 * ((doc_id + 3*ys + 5*xs) % 256)
                 + 587 * ((doc_id + 3*ys + 5*xs + 11) % 256)
                 + 114 * ((doc_id + 3*ys + 5*xs + 22) % 256) AS l
            FROM grid
        ),
        bits AS (
            SELECT doc_id, w, h, i, j,
                   CASE WHEN 64 * l > sum(l) OVER (PARTITION BY doc_id)
                        THEN 1 ELSE 0 END AS bit
            FROM luma
        )
        SELECT doc_id,
               CAST(w AS BIGINT) AS width,
               CAST(h AS BIGINT) AS height,
               string_agg(CAST(bit AS VARCHAR), '' ORDER BY i, j) AS ahash_bits,
               CAST(sum(bit) AS BIGINT) AS n_set_bits
        FROM bits
        GROUP BY doc_id, w, h
    """,
    # recompute the synthetic camera's statistics from the pixel formula —
    # any decoder bug (header parse, stride, channel order) breaks the hash
    "multimodal_ppm_decode": """
        WITH meta AS (
            SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
            FROM documents
        ),
        px AS (
            SELECT doc_id, w, h,
                   (doc_id + 3*y.y + 5*x.x) % 256 AS r,
                   (doc_id + 3*y.y + 5*x.x + 11) % 256 AS g,
                   (doc_id + 3*y.y + 5*x.x + 22) % 256 AS b
            FROM meta,
                 LATERAL (SELECT unnest(generate_series(0, CAST(h - 1 AS INT))) AS y) y,
                 LATERAL (SELECT unnest(generate_series(0, CAST(w - 1 AS INT))) AS x) x
        ),
        chan AS (
            SELECT doc_id, w, h,
                   sum(r) * 1.0 / (w * h) AS mr,
                   sum(g) * 1.0 / (w * h) AS mg,
                   sum(b) * 1.0 / (w * h) AS mb
            FROM px GROUP BY doc_id, w, h
        )
        SELECT doc_id,
               CAST(w AS BIGINT) AS width,
               CAST(h AS BIGINT) AS height,
               round(mr, 4) AS mean_r,
               round(mg, 4) AS mean_g,
               round(mb, 4) AS mean_b,
               round(0.299 * mr + 0.587 * mg + 0.114 * mb, 4) AS mean_luma
        FROM chan
    """,
    "multimodal_wav_decode": f"""
        WITH meta AS (
            SELECT doc_id, 160 + (doc_id % 7) * 80 AS n FROM documents
        ),
        samples AS (
            SELECT doc_id, n,
                   ((doc_id * 13 + i.i * 7) % 65536) - 32768 AS s
            FROM meta,
                 LATERAL (SELECT unnest(generate_series(0, CAST(n - 1 AS INT))) AS i) i
        )
        SELECT doc_id,
               CAST({SAMPLE_RATE} AS BIGINT) AS sample_rate,
               CAST(n AS BIGINT) AS n_samples,
               CAST(n * 1000 // {SAMPLE_RATE} AS BIGINT) AS duration_ms,
               round(sqrt(sum(s * s) * 1.0 / n), 4) AS rms,
               CAST(max(abs(s)) AS BIGINT) AS peak
        FROM samples GROUP BY doc_id, n
    """,
    "multimodal_image_tiles": f"""
        WITH meta AS (
            SELECT doc_id,
                   256 + (doc_id % 8) * 128 AS w,
                   256 + (doc_id % 5) * 128 AS h,
                   (256 + (doc_id % 8) * 128 + {TILE} - 1) // {TILE} AS n_cols,
                   (256 + (doc_id % 5) * 128 + {TILE} - 1) // {TILE} AS n_rows
            FROM documents
        )
        SELECT doc_id,
               CAST(r.tile_row AS BIGINT) AS tile_row,
               CAST(c.tile_col AS BIGINT) AS tile_col,
               CAST(c.tile_col * {TILE} AS BIGINT) AS x0,
               CAST(r.tile_row * {TILE} AS BIGINT) AS y0,
               CAST(least(c.tile_col * {TILE} + {TILE}, w) AS BIGINT) AS x1,
               CAST(least(r.tile_row * {TILE} + {TILE}, h) AS BIGINT) AS y1
        FROM meta,
             LATERAL (SELECT unnest(generate_series(0, CAST(n_rows - 1 AS INT)))
                      AS tile_row) r,
             LATERAL (SELECT unnest(generate_series(0, CAST(n_cols - 1 AS INT)))
                      AS tile_col) c
    """,
    "multimodal_audio_chunk": f"""
        WITH meta AS (
            SELECT doc_id, (5 + doc_id % 120) * 1000 AS duration_ms
            FROM documents
        ),
        n AS (
            SELECT doc_id, duration_ms,
                   greatest(1, (duration_ms - {CHUNK_MS} + {HOP_MS} - 1)
                               // {HOP_MS} + 1) AS n_chunks
            FROM meta
        )
        SELECT doc_id,
               CAST(c.chunk AS BIGINT) AS chunk,
               CAST(c.chunk * {HOP_MS} AS BIGINT) AS start_ms,
               CAST(least(c.chunk * {HOP_MS} + {CHUNK_MS}, duration_ms) AS BIGINT)
                   AS end_ms,
               CAST(c.chunk * {HOP_MS} * 16 AS BIGINT) AS start_sample,
               CAST(least(c.chunk * {HOP_MS} + {CHUNK_MS}, duration_ms) * 16 AS BIGINT)
                   AS end_sample
        FROM n, LATERAL (SELECT unnest(generate_series(0, CAST(n_chunks - 1 AS INT)))
                         AS chunk) c
    """,
    "multimodal_cols": """
        SELECT doc_id, lang, source,
               CAST(n_chars AS BIGINT) AS n_chars,
               CAST(label AS BIGINT) AS label,
               round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                           CAST(embedding AS DOUBLE[]))), 4) AS emb_norm
        FROM documents JOIN embeddings ON doc_id = vec_id
    """,
    "multimodal_binary_meta": """
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
               md5(text) AS content_md5,
               substr(text, 1, 16) AS head
        FROM documents
    """,
    # multimodal_decode_stub: rows-only (decoder faked; plumbing pinned in tests)
    "multimodal_frame_sample": f"""
        WITH meta AS (
            SELECT doc_id,
                   (1 + doc_id % 30) * {FPS} AS n_frames
            FROM documents
        )
        SELECT doc_id,
               CAST(s.slot AS BIGINT) AS slot,
               CAST((s.slot * (n_frames - 1)) // {FRAME_SLOTS - 1} AS BIGINT) AS frame_idx,
               CAST(((s.slot * (n_frames - 1)) // {FRAME_SLOTS - 1}) * 1000 // {FPS}
                   AS BIGINT) AS ts_ms
        FROM meta
        CROSS JOIN (SELECT unnest(generate_series(0, {FRAME_SLOTS - 1})) AS slot) s
    """,
}
