"""Multimodal column plumbing (north-star requirement).

Media rides as opaque `binary` columns with typed metadata, processed by
Arrow-batched pandas UDFs over mapInPandas. Two feature paths, both real:
byte-level stats (default) and a genuine decode (`decode=True`) that
interprets the payload as a headerless uint8 raster and mean-pools it in
NumPy — no codec libraries needed, and the oracle recomputes every pooled
pixel relationally. Swapping the raster reshape for PIL/ffmpeg changes
only the inside of the pandas UDF, none of the Spark plumbing.

At 100 TB: binary payloads dominate partition size — set
spark.sql.files.maxPartitionBytes so a task's Arrow batches fit executor
memory, and never groupBy on the payload itself (metadata columns carry
the keys).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """documents -> multimodal layout: opaque binary payload + typed
    metadata (the corpus has no real media; text bytes stand in as the
    payload, which keeps every byte-level code path honest)."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.col("n_chars").alias("meta_len"))


# Raw-raster geometry for decode=True: payload bytes are interpreted as a
# HxW uint8 grayscale image (truncate/zero-pad), mean-pooled in PxP blocks.
# The reference analog is exactly this: each record IS a line of 0-255
# pixel values parsed positionally (/root/reference/rbmmapper.java:91-119).
RASTER_H, RASTER_W, POOL = 16, 16, 4


def extract_features(df: DataFrame, payload_col: str = "payload",
                     decode: bool = False) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    decode=False (default): deterministic byte-level features
    (len/md5/byte stats) — schema `doc_id, byte_len, sig, feat`.

    decode=True: REAL decode, no codec libraries needed — the payload is
    interpreted as a raw HxW uint8 grayscale raster (headerless bitmap:
    truncate to H*W bytes, zero-pad short payloads), downsampled by PxP
    mean-pooling in NumPy. Output is one row per pooled pixel
    `doc_id, pr, pc, pooled` where pooled = block_sum / (P*P*255) —
    the block sum stays integer so the value is bit-reproducible in any
    engine. This is the shape a PIL/ffmpeg extractor would have
    (vectorized batch decode inside mapInPandas, metadata keys outside
    the payload); swapping the raster reshape for Image.open changes no
    Spark-side plumbing."""
    from ..shipping import ensure_shipped
    ensure_shipped(df.sparkSession)

    if decode:
        import numpy as np

        n_px = RASTER_H * RASTER_W
        pool_schema = "doc_id bigint, pr bigint, pc bigint, pooled double"
        hp, wp = RASTER_H // POOL, RASTER_W // POOL
        prs = np.repeat(np.arange(hp, dtype=np.int64), wp)
        pcs = np.tile(np.arange(wp, dtype=np.int64), hp)

        def decode_pool(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                ids, out = [], []
                for did, b in zip(pdf["doc_id"], pdf[payload_col]):
                    raw = np.frombuffer(bytes(b)[:n_px], dtype=np.uint8)
                    if raw.size < n_px:
                        raw = np.pad(raw, (0, n_px - raw.size))
                    img = raw.reshape(RASTER_H, RASTER_W).astype(np.int64)
                    bsum = img.reshape(hp, POOL, wp, POOL).sum(axis=(1, 3))
                    out.append(bsum.ravel() / (POOL * POOL * 255.0))
                    ids.append(did)
                n = len(ids)
                yield pd.DataFrame({
                    "doc_id": np.repeat(np.asarray(ids, dtype=np.int64), hp * wp),
                    "pr": np.tile(prs, n),
                    "pc": np.tile(pcs, n),
                    "pooled": (np.concatenate(out) if out
                               else np.empty(0, dtype=np.float64)),
                })

        return df.mapInPandas(decode_pool, pool_schema)

    schema = ("doc_id bigint, byte_len bigint, sig string, "
              "feat array<double>")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for pdf in batches:
            payloads = pdf[payload_col]
            out = {
                "doc_id": pdf["doc_id"],
                "byte_len": payloads.map(len),
                "sig": payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                # 4-dim deterministic byte-statistics "embedding"
                "feat": payloads.map(lambda b: [
                    len(b) / 1000.0,
                    (sum(bytes(b)[:64]) % 256) / 255.0,
                    (bytes(b)[0] if len(b) else 0) / 255.0,
                    (bytes(b)[-1] if len(b) else 0) / 255.0,
                ]),
            }
            yield pd.DataFrame(out)

    return df.mapInPandas(extract, schema)


@query("multimodal_meta", oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       md5(text) AS sig
FROM documents
""")
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata through the full pandas-UDF path: encode ->
    mapInPandas -> (byte_len, md5 sig). Oracle recomputes both from the
    text (utf-8 md5 == payload md5)."""
    docs = load(spark, sf_dir, "documents")
    mm = attach_binary_payload(docs)
    return extract_features(mm).select("doc_id", "byte_len", "sig")


@query("multimodal_features", oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       round(octet_length(encode(text)) / 1000.0, 6) AS f0,
       round((coalesce(list_aggregate(
                list_transform(range(1, least(length(text), 64) + 1),
                               i -> ascii(text[i])), 'sum'), 0) % 256)
             / 255.0, 6) AS f1
FROM documents
""")
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic byte-level features through the full mapInPandas
    path. The oracle recomputes them relationally from the text — valid
    because this corpus is pure ASCII (byte == code point, checked in
    tests); on real binary media the raster decode path takes over."""
    docs = load(spark, sf_dir, "documents")
    mm = attach_binary_payload(docs)
    out = extract_features(mm)
    return out.select("doc_id", "byte_len",
                      F.round(F.element_at("feat", 1), 6).alias("f0"),
                      F.round(F.element_at("feat", 2), 6).alias("f1"))


@query("multimodal_decode_pool", oracle=f"""
WITH px AS (
  SELECT d.doc_id, r.i,
         CASE WHEN r.i < octet_length(encode(d.text))
              THEN ascii(substr(d.text, CAST(r.i + 1 AS INTEGER), 1))
              ELSE 0 END AS v
  FROM documents d CROSS JOIN range({RASTER_H * RASTER_W}) r(i)
)
SELECT doc_id,
       (i // {RASTER_W}) // {POOL} AS pr,
       (i % {RASTER_W}) // {POOL} AS pc,
       round(sum(v) / {POOL * POOL * 255}.0, 9) AS pooled
FROM px GROUP BY doc_id, pr, pc
""")
def multimodal_decode_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode path end-to-end: binary payload -> headerless
    16x16 uint8 raster -> 4x4 mean-pool, in mapInPandas
    (extract_features(decode=True)). The oracle recomputes every pooled
    pixel relationally — ascii(char) == payload byte on this pure-ASCII
    corpus, zero-padding as CASE — and matches bit-for-bit because the
    block sum is integer-exact in both engines (one float division at
    the end). Reference analog: positional 0-255 pixel-line parsing,
    rbmmapper.java:91-119."""
    docs = load(spark, sf_dir, "documents")
    mm = attach_binary_payload(docs)
    out = extract_features(mm, decode=True)
    return out.select("doc_id", "pr", "pc", F.round("pooled", 9).alias("pooled"))


# Frame-sampling geometry for the video-shaped path: the payload is a
# stream of FRAME-byte frames; every STRIDE-th frame is kept (frame 0,
# STRIDE, 2*STRIDE, ...), the final partial frame zero-padded. The frame
# SUM stays integer so every value is bit-reproducible in any engine.
FRAME, STRIDE = 32, 4
_MAX_FRAMES = 64  # oracle range bound; 64*32 = 2048 bytes >> max doc len


@query("multimodal_frame_sample", oracle=f"""
WITH f AS (
  SELECT d.doc_id, r.f AS frame_id,
         CAST(octet_length(encode(d.text)) AS BIGINT) AS blen, d.text
  FROM documents d CROSS JOIN range({_MAX_FRAMES}) r(f)
  WHERE r.f * {FRAME} < octet_length(encode(d.text))
    AND r.f % {STRIDE} = 0
),
px AS (
  SELECT doc_id, frame_id, blen,
         CASE WHEN frame_id * {FRAME} + b.i < blen
              THEN ascii(substr(text, CAST(frame_id * {FRAME} + b.i + 1 AS INTEGER), 1))
              ELSE 0 END AS v
  FROM f CROSS JOIN range({FRAME}) b(i)
)
SELECT doc_id, frame_id, CAST(sum(v) AS BIGINT) AS fsum,
       round(sum(v) / {FRAME * 255}.0, 9) AS fmean
FROM px GROUP BY doc_id, frame_id
""")
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-shaped frame sampling over opaque binary payloads: split the
    payload into fixed FRAME-byte frames, keep every STRIDE-th frame
    (uniform temporal subsampling — the standard first step of any video
    feature pipeline), emit per-frame integer byte-sum + mean.

    The decode inside mapInPandas is a NumPy frombuffer + reshape —
    swapping it for an ffmpeg/pyav frame decoder changes only the UDF
    body, none of the Spark plumbing (schema, batching, partitioning).
    The oracle recomputes every sampled frame relationally (ascii(char)
    == payload byte on this pure-ASCII corpus, zero-pad as CASE).

    At 100 TB: frame sampling is a NARROW map — no shuffle; output rows
    carry only (doc_id, frame_id, stats), never the frame bytes, so
    downstream aggs shuffle metadata, not media."""
    import numpy as np

    docs = load(spark, sf_dir, "documents")
    mm = attach_binary_payload(docs)
    schema = "doc_id bigint, frame_id bigint, fsum bigint, fmean double"

    def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # half-away snap matching DuckDB round() (np.round is banker's
        # — the ab_cuped_adjustment class); imported inside the closure
        # so the pickled UDF resolves it on the shipped worker package
        from ..functions.math import round_half_away_arr

        for pdf in batches:
            ids, fids, sums = [], [], []
            for did, b in zip(pdf["doc_id"], pdf["payload"]):
                raw = np.frombuffer(bytes(b), dtype=np.uint8)
                n_frames = -(-raw.size // FRAME)  # ceil
                pad = n_frames * FRAME - raw.size
                fr = np.pad(raw, (0, pad)).reshape(n_frames, FRAME)
                keep = np.arange(0, n_frames, STRIDE)
                fsum = fr[keep].astype(np.int64).sum(axis=1)
                ids.extend([did] * keep.size)
                fids.append(keep)
                sums.append(fsum)
            yield pd.DataFrame({
                "doc_id": np.asarray(ids, dtype=np.int64),
                "frame_id": (np.concatenate(fids) if fids
                             else np.empty(0, dtype=np.int64)),
                "fsum": (np.concatenate(sums) if sums
                         else np.empty(0, dtype=np.int64)),
            }).assign(fmean=lambda d: round_half_away_arr(
                d["fsum"] / (FRAME * 255.0), 9))

    return mm.mapInPandas(sample_frames, schema)


# Audio-shaped geometry: the payload is 8-bit PCM centered at 128; frames
# of WIN samples, short final frame padded with 128 (digital silence, so
# padding adds zero energy and no crossings). Energy and zero-crossing
# sums stay integer -> bit-reproducible in any engine.
WIN = 64
_MAX_WIN = 16  # oracle range bound; 16*64 = 1024 bytes > max doc len


@query("multimodal_audio_energy", oracle=f"""
WITH px AS (
  SELECT d.doc_id, r.i // {WIN} AS frame_id, r.i AS i,
         CASE WHEN r.i < octet_length(encode(d.text))
              THEN ascii(substr(d.text, CAST(r.i + 1 AS INTEGER), 1)) - 128
              ELSE 0 END AS v
  FROM documents d CROSS JOIN range({_MAX_WIN * WIN}) r(i)
  WHERE (r.i // {WIN}) * {WIN} < octet_length(encode(d.text))
),
p2 AS (
  SELECT doc_id, frame_id, i, v,
         lead(v) OVER (PARTITION BY doc_id, frame_id ORDER BY i) AS vn
  FROM px
)
SELECT doc_id, frame_id,
       CAST(sum(v * v) AS BIGINT) AS energy,
       CAST(coalesce(sum(CASE WHEN v * vn < 0 THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS zero_crossings
FROM p2 GROUP BY doc_id, frame_id
""")
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-shaped feature extraction over opaque binary payloads: treat
    the payload as 8-bit PCM (samples centered at 128), window into
    WIN-sample frames, emit per-frame ENERGY (sum of squared deviation)
    and ZERO-CROSSING count — the two cheapest speech/audio activity
    features, the standard first pass before any codec or model.

    The decode inside mapInPandas is NumPy frombuffer + reshape; swapping
    it for soundfile/librosa changes only the UDF body, none of the Spark
    plumbing. The oracle recomputes every frame relationally
    (ascii(char)-128 == centered sample on this pure-ASCII corpus,
    silence-padding as CASE) with a lead() window for crossings — both
    sums integer-exact in both engines.

    At 100 TB: a NARROW map — no shuffle; output rows carry (doc_id,
    frame_id, two ints), never the waveform."""
    docs = load(spark, sf_dir, "documents")
    mm = attach_binary_payload(docs)
    from ..shipping import ensure_shipped
    ensure_shipped(spark)

    return mm.mapInPandas(audio_frames, AUDIO_SCHEMA)


AUDIO_SCHEMA = ("doc_id bigint, frame_id bigint, energy bigint, "
                "zero_crossings bigint")


def audio_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """PCM framing UDF body (module-level so tests can drive it on
    synthetic payloads)."""
    import numpy as np

    for pdf in batches:
        ids, fids, en, zc = [], [], [], []
        for did, b in zip(pdf["doc_id"], pdf["payload"]):
            raw = np.frombuffer(bytes(b), dtype=np.uint8).astype(np.int64)
            # zero-byte payload -> zero frames, matching the oracle's
            # WHERE (which emits no rows for an empty document)
            nf = -(-raw.size // WIN)
            if nf == 0:
                continue
            pad = np.full(nf * WIN, 128, dtype=np.int64)
            pad[:raw.size] = raw
            d = (pad - 128).reshape(nf, WIN)
            ids.extend([did] * nf)
            fids.extend(range(nf))
            en.extend((d * d).sum(axis=1).tolist())
            zc.extend(((d[:, :-1] * d[:, 1:]) < 0).sum(axis=1).tolist())
        yield pd.DataFrame({
            "doc_id": np.asarray(ids, dtype=np.int64),
            "frame_id": np.asarray(fids, dtype=np.int64),
            "energy": np.asarray(en, dtype=np.int64),
            "zero_crossings": np.asarray(zc, dtype=np.int64),
        })


_CUT_T = 300  # scene-cut threshold on the per-frame byte-sum jump


@query("multimodal_scene_cuts", oracle=f"""
WITH f AS (
  SELECT d.doc_id, r.f AS frame_id,
         CAST(octet_length(encode(d.text)) AS BIGINT) AS blen, d.text
  FROM documents d CROSS JOIN range({_MAX_FRAMES}) r(f)
  WHERE r.f * {FRAME} < octet_length(encode(d.text))
),
px AS (
  SELECT doc_id, frame_id,
         CASE WHEN frame_id * {FRAME} + b.i < blen
              THEN ascii(substr(text,
                   CAST(frame_id * {FRAME} + b.i + 1 AS INTEGER), 1))
              ELSE 0 END AS v
  FROM f CROSS JOIN range({FRAME}) b(i)
),
s AS (
  SELECT doc_id, frame_id, CAST(sum(v) AS BIGINT) AS fsum
  FROM px GROUP BY doc_id, frame_id
),
d AS (
  SELECT doc_id, frame_id, fsum,
         fsum - lag(fsum) OVER (PARTITION BY doc_id
                                ORDER BY frame_id) AS diff
  FROM s
)
SELECT doc_id, frame_id, CAST(abs(diff) AS BIGINT) AS jump
FROM d WHERE abs(diff) > {_CUT_T}
""")
def multimodal_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut (shot-boundary) detection over video-shaped payloads:
    consecutive-frame signal jumps above a threshold mark cuts — the
    keyframe selector every video-training pipeline runs so it samples
    one frame per shot instead of near-duplicate frames within one.
    Statistics are INTEGER byte-sums and integer diffs, so both engines
    agree bit-for-bit with no rounding grid at all.

    The whole detector lives inside the SAME mapInPandas pass that
    decodes frames (np.diff on the per-doc frame-sum vector — the
    temporal neighborhood is local to the document, so no window over a
    shuffled frame stream is ever needed): a swap to a real decoder
    again changes only the UDF body. At 100 TB this stays a narrow map
    emitting (doc, cut_frame, jump) metadata; the oracle replays frames
    relationally and takes the lag-window form instead."""
    import numpy as np

    docs = load(spark, sf_dir, "documents")
    mm = attach_binary_payload(docs)
    schema = "doc_id bigint, frame_id bigint, jump bigint"

    def cuts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fids, jumps = [], [], []
            for did, b in zip(pdf["doc_id"], pdf["payload"]):
                raw = np.frombuffer(bytes(b), dtype=np.uint8)
                if raw.size == 0:
                    continue
                n_frames = -(-raw.size // FRAME)
                pad = n_frames * FRAME - raw.size
                fr = np.pad(raw, (0, pad)).reshape(n_frames, FRAME)
                fsum = fr.astype(np.int64).sum(axis=1)
                diff = np.abs(np.diff(fsum))
                cut = np.nonzero(diff > _CUT_T)[0] + 1
                ids.extend([did] * cut.size)
                fids.append(cut)
                jumps.append(diff[cut - 1])
            yield pd.DataFrame({
                "doc_id": np.asarray(ids, dtype=np.int64),
                "frame_id": (np.concatenate(fids).astype(np.int64) if fids
                             else np.empty(0, dtype=np.int64)),
                "jump": (np.concatenate(jumps).astype(np.int64) if jumps
                         else np.empty(0, dtype=np.int64)),
            })

    return mm.mapInPandas(cuts, schema)


_RS = 2  # nearest-neighbor resize stride: 16x16 -> 8x8


@query("multimodal_resize_nn", oracle=f"""
WITH px AS (
  SELECT d.doc_id, r.i,
         CASE WHEN r.i < octet_length(encode(d.text))
              THEN ascii(substr(d.text, CAST(r.i + 1 AS INTEGER), 1))
              ELSE 0 END AS v
  FROM documents d CROSS JOIN range({RASTER_H * RASTER_W}) r(i)
),
grid AS (
  SELECT doc_id, i // {RASTER_W} AS row_, i % {RASTER_W} AS col_, v
  FROM px
)
SELECT doc_id,
       CAST(row_ // {_RS} AS BIGINT) AS orow,
       CAST(col_ // {_RS} AS BIGINT) AS ocol,
       CAST(v AS BIGINT) AS pix
FROM grid
WHERE row_ % {_RS} = 0 AND col_ % {_RS} = 0
""")
def multimodal_resize_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image RESIZE on the decoded raster — nearest-neighbor 2x
    downsample (16x16 -> 8x8: keep every 2nd pixel in both axes), the
    subsampling complement to multimodal_decode_pool's mean-pool
    (anti-aliased resize). Output pixels are raw SELECTED bytes, so the
    oracle agreement is integer-exact with no rounding anywhere.

    Decode + stride live in one mapInPandas pass (NumPy [::2, ::2]
    view — zero copies); swapping in PIL/cv2 interpolation changes only
    the UDF body. Narrow map, no shuffle: at 100 TB resize throughput
    is scan bandwidth, and the output carries 1/4 of the pixel volume
    downstream — the reason pipelines resize before they shuffle."""
    import numpy as np

    docs = load(spark, sf_dir, "documents")
    mm = attach_binary_payload(docs)
    schema = "doc_id bigint, orow bigint, ocol bigint, pix bigint"

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        oh, ow = RASTER_H // _RS, RASTER_W // _RS
        rows = np.repeat(np.arange(oh, dtype=np.int64), ow)
        cols = np.tile(np.arange(ow, dtype=np.int64), oh)
        for pdf in batches:
            ids, pix = [], []
            for did, b in zip(pdf["doc_id"], pdf["payload"]):
                raw = np.frombuffer(bytes(b), dtype=np.uint8)
                img = np.zeros(RASTER_H * RASTER_W, dtype=np.uint8)
                img[:raw.size] = raw[:RASTER_H * RASTER_W]
                small = img.reshape(RASTER_H, RASTER_W)[::_RS, ::_RS]
                ids.append(np.full(oh * ow, did, dtype=np.int64))
                pix.append(small.ravel().astype(np.int64))
            n = len(ids)
            yield pd.DataFrame({
                "doc_id": (np.concatenate(ids) if n
                           else np.empty(0, dtype=np.int64)),
                "orow": (np.tile(rows, n) if n
                         else np.empty(0, dtype=np.int64)),
                "ocol": (np.tile(cols, n) if n
                         else np.empty(0, dtype=np.int64)),
                "pix": (np.concatenate(pix) if n
                        else np.empty(0, dtype=np.int64)),
            })

    return mm.mapInPandas(resize, schema)


def phash_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document perceptual hash (the dHash pooled-block compare) —
    factored so the dedup report and the verified-dedup composition
    share one builder."""
    import numpy as np

    docs = load(spark, sf_dir, "documents")
    mm = attach_binary_payload(docs)
    n_px = RASTER_H * RASTER_W
    hp, wp = RASTER_H // POOL, RASTER_W // POOL
    weights = (2 ** np.arange(hp * (wp - 1), dtype=np.int64)).reshape(
        hp, wp - 1)

    def phash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs = [], []
            for did, b in zip(pdf["doc_id"], pdf["payload"]):
                raw = np.frombuffer(bytes(b)[:n_px], dtype=np.uint8)
                if raw.size < n_px:
                    raw = np.pad(raw, (0, n_px - raw.size))
                img = raw.reshape(RASTER_H, RASTER_W).astype(np.int64)
                bsum = img.reshape(hp, POOL, wp, POOL).sum(axis=(1, 3))
                bits = (bsum[:, :-1] > bsum[:, 1:]).astype(np.int64)
                ids.append(did)
                hs.append(int((bits * weights).sum()))
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "phash": pd.Series(hs, dtype="int64")})

    return mm.mapInPandas(phash, "doc_id bigint, phash bigint")


@query("multimodal_phash_dedup", oracle=f"""
WITH px AS (
  SELECT d.doc_id, r.i,
         CASE WHEN r.i < octet_length(encode(d.text))
              THEN ascii(substr(d.text, CAST(r.i + 1 AS INTEGER), 1))
              ELSE 0 END AS v
  FROM documents d CROSS JOIN range({RASTER_H * RASTER_W}) r(i)
),
blk AS (
  SELECT doc_id, (i // {RASTER_W}) // {POOL} AS pr,
         (i % {RASTER_W}) // {POOL} AS pc, sum(v) AS s
  FROM px GROUP BY doc_id, pr, pc
),
bits AS (
  SELECT a.doc_id,
         CASE WHEN a.s > nxt.s
              THEN CAST(pow(2, a.pr * {RASTER_W // POOL - 1} + a.pc) AS BIGINT)
              ELSE 0 END AS bit
  FROM blk a JOIN blk nxt
    ON nxt.doc_id = a.doc_id AND nxt.pr = a.pr AND nxt.pc = a.pc + 1
),
ph AS (SELECT doc_id, CAST(sum(bit) AS BIGINT) AS phash
       FROM bits GROUP BY doc_id)
SELECT phash, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS keep_id
FROM ph GROUP BY phash HAVING count(*) >= 2
""")
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-dup detection on the DECODED raster — the
    image-dedup pass of a multimodal corpus build (dHash family): each
    payload decodes to the 16x16 raster, mean-pool blocks reduce it to
    4x4, and the hash bit (r, c) records whether block (r,c) outshines
    its right neighbor — a gradient signature invariant to global
    brightness/contrast shifts. Docs sharing a hash form a duplicate
    cluster; the lowest doc_id survives.

    The comparison runs on the INTEGER block sums (never the float
    pooled values), so every bit is exact in both engines. Spark side:
    the hash computes inside the same Arrow-batched mapInPandas decode
    as the other raster features (one pass over payload bytes, 8 bytes
    out per doc), then one hash-keyed aggregate — at 100 TB the dedup
    cost after decode is the exact-dedup shape: a single keyed shuffle
    of (hash, doc_id) pairs. A production build widens the raster and
    hash (e.g. 9x8 -> 64-bit dHash) and adds a Hamming-ball band join
    for near-matches; the plumbing here is that pipeline minus the
    codec."""
    from ..shipping import ensure_shipped
    ensure_shipped(spark)
    ph = phash_df(spark, sf_dir)
    return (ph.groupBy("phash")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min("doc_id").cast("bigint").alias("keep_id"))
            .filter(F.col("n_docs") >= 2))


# Interior pixels and per-pixel Laplacian ceiling for the sharpness norm.
_LAP_INTERIOR = (RASTER_H - 2) * (RASTER_W - 2)
_LAP_MAX = 4 * 255


@query("multimodal_laplacian_sharpness", oracle=f"""
WITH px AS (
  SELECT d.doc_id, r.i,
         CASE WHEN r.i < octet_length(encode(d.text))
              THEN ascii(substr(d.text, CAST(r.i + 1 AS INTEGER), 1))
              ELSE 0 END AS v
  FROM documents d CROSS JOIN range({RASTER_H * RASTER_W}) r(i)
),
lap AS (
  SELECT c.doc_id,
         abs(4 * c.v - u.v - dn.v - lf.v - rt.v) AS a
  FROM px c
  JOIN px u  ON u.doc_id = c.doc_id AND u.i = c.i - {RASTER_W}
  JOIN px dn ON dn.doc_id = c.doc_id AND dn.i = c.i + {RASTER_W}
  JOIN px lf ON lf.doc_id = c.doc_id AND lf.i = c.i - 1
  JOIN px rt ON rt.doc_id = c.doc_id AND rt.i = c.i + 1
  WHERE c.i // {RASTER_W} BETWEEN 1 AND {RASTER_H - 2}
    AND c.i % {RASTER_W} BETWEEN 1 AND {RASTER_W - 2}
)
SELECT doc_id, CAST(sum(a) AS BIGINT) AS lap_abs_sum,
       round(sum(a) / ({_LAP_INTERIOR} * {_LAP_MAX}.0), 9) AS sharpness
FROM lap GROUP BY doc_id
""")
def multimodal_laplacian_sharpness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IMAGE SHARPNESS via the discrete Laplacian (the blur filter of
    image-corpus curation: blurry crawl thumbnails score near zero and
    get dropped before any captioning model wastes tokens on them):
    per decoded 16x16 raster, the sum of |4v - N - S - E - W| over
    interior pixels, normalized by the ceiling — all INTEGER until the
    final normalization, so both engines agree bit-for-bit. Engine
    side: NumPy stencil inside the same Arrow mapInPandas batch shape
    as the decode/pool/resize family; oracle: four positional
    self-joins on the unrolled pixel relation. At 100 TB this is a
    narrow per-image map — no shuffle, embarrassing parallel."""
    import numpy as np

    docs = load(spark, sf_dir, "documents")
    mm = attach_binary_payload(docs)

    def lap_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sums = [], []
            for did, b in zip(pdf["doc_id"], pdf["payload"]):
                raw = np.frombuffer(bytes(b), dtype=np.uint8)
                pad = RASTER_H * RASTER_W - raw.size
                if pad > 0:
                    raw = np.pad(raw, (0, pad))
                img = raw[:RASTER_H * RASTER_W].reshape(
                    RASTER_H, RASTER_W).astype(np.int64)
                lap = (4 * img[1:-1, 1:-1]
                       - img[:-2, 1:-1] - img[2:, 1:-1]
                       - img[1:-1, :-2] - img[1:-1, 2:])
                ids.append(did)
                sums.append(int(np.abs(lap).sum()))
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "lap_abs_sum": pd.Series(sums, dtype="int64")})

    out = mm.select("doc_id", "payload").mapInPandas(
        lap_batches, "doc_id bigint, lap_abs_sum bigint")
    return out.select(
        "doc_id", "lap_abs_sum",
        F.round(F.col("lap_abs_sum") / float(_LAP_INTERIOR * _LAP_MAX), 9)
        .alias("sharpness"))


# Silence-trim threshold: a centered 8-bit PCM sample with |deviation|
# above this is "active". On the pure-ASCII stand-in corpus this labels
# spaces/digits/punctuation (large deviation from 128) active and
# lowercase letters silent — a fixed, engine-neutral integer split.
TRIM_THRESH = 60


@query("multimodal_audio_trim_silence", oracle=f"""
WITH px AS (
  SELECT d.doc_id, r.i AS i,
         ascii(substr(d.text, CAST(r.i + 1 AS INTEGER), 1)) - 128 AS v
  FROM documents d CROSS JOIN range({_MAX_WIN * WIN}) r(i)
  WHERE r.i < octet_length(encode(d.text))
)
SELECT doc_id,
       CAST(min(i) AS BIGINT) AS trim_start,
       CAST(max(i) AS BIGINT) AS trim_end,
       CAST(max(i) - min(i) + 1 AS BIGINT) AS active_span,
       CAST(count(*) AS BIGINT) AS n_active
FROM px WHERE abs(v) > {TRIM_THRESH}
GROUP BY doc_id
""")
def multimodal_audio_trim_silence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading/trailing-silence trim bounds over 8-bit PCM payloads: the
    first and last sample whose |deviation from 128| exceeds TRIM_THRESH,
    plus the active span and active-sample count — the standard VAD-free
    preprocessing pass before windowed feature extraction (ffmpeg's
    silenceremove / librosa.effects.trim, reduced to its integer core).
    Documents with no active sample emit no row, matching the oracle's
    inner filter.

    Decode is NumPy frombuffer + argwhere inside mapInPandas (Arrow
    batches); the oracle recomputes every sample relationally via the
    same bounded range-join used by multimodal_audio_energy. All outputs
    are integer positions — bit-reproducible in any engine.

    At 100 TB: a NARROW map, no shuffle; emits 5 small ints per doc and
    never the waveform. The trim bounds are exactly what a downstream
    `substr(payload, trim_start, active_span)` re-slice needs, so the
    expensive byte scan happens once."""
    import numpy as np

    docs = load(spark, sf_dir, "documents")
    mm = attach_binary_payload(docs)

    def trim_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, lo, hi, nact = [], [], [], []
            for did, b in zip(pdf["doc_id"], pdf["payload"]):
                raw = np.frombuffer(bytes(b), dtype=np.uint8).astype(np.int64)
                active = np.nonzero(np.abs(raw - 128) > TRIM_THRESH)[0]
                if active.size == 0:
                    continue
                ids.append(did)
                lo.append(int(active[0]))
                hi.append(int(active[-1]))
                nact.append(int(active.size))
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "trim_start": pd.Series(lo, dtype="int64"),
                "trim_end": pd.Series(hi, dtype="int64"),
                "n_active": pd.Series(nact, dtype="int64")})

    out = mm.select("doc_id", "payload").mapInPandas(
        trim_batches,
        "doc_id bigint, trim_start bigint, trim_end bigint, n_active bigint")
    return out.select(
        "doc_id", "trim_start", "trim_end",
        (F.col("trim_end") - F.col("trim_start") + F.lit(1))
        .cast("bigint").alias("active_span"),
        "n_active")


# Intensity histogram geometry: 16 bins of width 16 over the uint8 range,
# computed on the same padded RASTER_H x RASTER_W raster as decode_pool.
_HIST_BINS = 16


@query("multimodal_histogram_equalize", oracle=f"""
WITH px AS (
  SELECT d.doc_id, r.i AS i,
         CASE WHEN r.i < octet_length(encode(d.text))
              THEN ascii(substr(d.text, CAST(r.i + 1 AS INTEGER), 1))
              ELSE 0 END AS v
  FROM documents d CROSS JOIN range({RASTER_H * RASTER_W}) r(i)
),
b AS (
  SELECT doc_id, v // {256 // _HIST_BINS} AS bin, count(*) AS n
  FROM px GROUP BY doc_id, bin
)
SELECT doc_id, CAST(bin AS BIGINT) AS bin, CAST(n AS BIGINT) AS n_px,
       CAST(sum(n) OVER (PARTITION BY doc_id ORDER BY bin) AS BIGINT)
         AS cdf_px
FROM b
""")
def multimodal_histogram_equalize(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Per-image INTENSITY HISTOGRAM with the cumulative counts that
    drive histogram equalization: 16 bins over the uint8 range on the
    same truncate/zero-pad raster as multimodal_decode_pool, plus the
    running CDF per image — `equalized_level(bin) = round((L-1) *
    cdf_px / total)` is a pure projection over this output, so the
    operator IS the data side of cv2.equalizeHist, engine-checked.
    Empty bins emit no row (sparse histogram), matching the oracle's
    GROUP BY.

    Both histogram and CDF are computed INSIDE the batch UDF (NumPy
    bincount + cumsum per image) — all-integer, bit-reproducible; the
    oracle rebuilds every pixel relationally via the bounded range-join
    (multimodal_audio_energy precedent).

    At 100 TB: a NARROW map, no shuffle at all — even the per-image
    cumulative sum stays inside the Arrow batch because an image's
    histogram never spans partitions. Output is <= 16 small ints per
    image, never the raster."""
    import numpy as np

    docs = load(spark, sf_dir, "documents")
    mm = attach_binary_payload(docs)
    n_px = RASTER_H * RASTER_W
    width = 256 // _HIST_BINS

    def hist_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # One output frame PER incoming Arrow batch (the lap/trim sibling
        # convention) — never accumulate a whole partition in Python lists.
        for pdf in batches:
            ids, bins, ns, cdfs = [], [], [], []
            for did, b in zip(pdf["doc_id"], pdf["payload"]):
                raw = np.frombuffer(bytes(b)[:n_px], dtype=np.uint8)
                if raw.size < n_px:
                    raw = np.pad(raw, (0, n_px - raw.size))
                counts = np.bincount(raw // width, minlength=_HIST_BINS)
                cdf = counts.cumsum()
                nz = np.nonzero(counts)[0]
                ids.extend([did] * nz.size)
                bins.extend(nz.tolist())
                ns.extend(counts[nz].tolist())
                cdfs.extend(cdf[nz].tolist())
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "bin": pd.Series(bins, dtype="int64"),
                "n_px": pd.Series(ns, dtype="int64"),
                "cdf_px": pd.Series(cdfs, dtype="int64")})

    return mm.select("doc_id", "payload").mapInPandas(
        hist_batches,
        "doc_id bigint, bin bigint, n_px bigint, cdf_px bigint")


# Brightness/contrast culling thresholds as EXACT INTEGER predicates on
# the raster's (sum, sum-of-squares): dark = mean < 0.2*255, bright =
# mean > 0.8*255, low-contrast = variance < 20^2. N_PX * those bounds:
_BC_NPX = RASTER_H * RASTER_W                     # 256 pixels
_BC_DARK_S1 = int(0.2 * 255 * _BC_NPX)            # 13056
_BC_BRIGHT_S1 = int(0.8 * 255 * _BC_NPX)          # 52224
_BC_LOWC = 400 * _BC_NPX * _BC_NPX                # var*NPX^2 bound


@query("multimodal_brightness_contrast_filter", oracle=f"""
WITH px AS (
  SELECT d.doc_id, r.i,
         CASE WHEN r.i < octet_length(encode(d.text))
              THEN ascii(substr(d.text, CAST(r.i + 1 AS INTEGER), 1))
              ELSE 0 END AS v
  FROM documents d CROSS JOIN range({_BC_NPX}) r(i)
),
s AS (SELECT doc_id, sum(v) AS s1, sum(v * v) AS s2
      FROM px GROUP BY doc_id)
SELECT doc_id,
       round(s1 / {255 * _BC_NPX}.0, 6) AS brightness,
       round(sqrt(s2 / {_BC_NPX}.0
                  - (s1 / {_BC_NPX}.0) * (s1 / {_BC_NPX}.0)), 6)
         AS rms_contrast,
       CAST(CASE WHEN s1 >= {_BC_DARK_S1} THEN 1 ELSE 0 END AS BIGINT)
         AS pass_dark,
       CAST(CASE WHEN s1 <= {_BC_BRIGHT_S1} THEN 1 ELSE 0 END AS BIGINT)
         AS pass_bright,
       CAST(CASE WHEN s2 * {_BC_NPX} - s1 * s1 >= {_BC_LOWC}
            THEN 1 ELSE 0 END AS BIGINT) AS pass_contrast,
       CAST(CASE WHEN s1 >= {_BC_DARK_S1} AND s1 <= {_BC_BRIGHT_S1}
                  AND s2 * {_BC_NPX} - s1 * s1 >= {_BC_LOWC}
            THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM s
""")
def multimodal_brightness_contrast_filter(spark: SparkSession,
                                          sf_dir: str) -> DataFrame:
    """Image-hygiene culling: per-image BRIGHTNESS (mean pixel) and RMS
    CONTRAST (pixel standard deviation) from the decoded raster, with
    keep flags for the three standard multimodal-corpus culls — too
    dark, too bright (blown-out), too flat (near-uniform images carry
    no training signal; solid-color placeholders and tracking pixels
    die here). The vision-pipeline sibling of
    corpus_gopher_quality_rules: per-rule audit bits plus the
    conjunctive keep.

    The decode (payload -> 16x16 uint8 raster, zero-padded) happens in
    the same Arrow mapInPandas path as the rest of the decode family,
    emitting only the per-image INTEGER moments (Σv, Σv²); every cull
    predicate compares those exact integers against precomputed integer
    bounds (mean < 0.2*255 ⟺ Σv < {_BC_DARK_S1}; var < 400 ⟺
    Σv²·N − (Σv)² < {_BC_LOWC}) — no float ever decides a flag, the
    reported brightness/contrast are display-rounded derivations.
    Scale: one scan, two bigints per image out of Python, zero
    shuffles; swapping the raster decode for Image.open changes no
    plumbing (extract_features' argument)."""
    from ..shipping import ensure_shipped

    docs = load(spark, sf_dir, "documents")
    mm = attach_binary_payload(docs)
    ensure_shipped(spark)

    import numpy as np

    def moments(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, s1s, s2s = [], [], []
            for did, b in zip(pdf["doc_id"], pdf["payload"]):
                raw = np.frombuffer(bytes(b)[:_BC_NPX], dtype=np.uint8)
                if raw.size < _BC_NPX:
                    raw = np.pad(raw, (0, _BC_NPX - raw.size))
                v = raw.astype(np.int64)
                ids.append(did)
                s1s.append(int(v.sum()))
                s2s.append(int((v * v).sum()))
            yield pd.DataFrame({"doc_id": ids, "s1": s1s, "s2": s2s})

    s = mm.mapInPandas(moments, "doc_id bigint, s1 bigint, s2 bigint")
    s1, s2 = F.col("s1"), F.col("s2")
    npx = float(_BC_NPX)
    p_dark = s1 >= _BC_DARK_S1
    p_bright = s1 <= _BC_BRIGHT_S1
    p_contrast = s2 * _BC_NPX - s1 * s1 >= _BC_LOWC

    def bit(c):
        return F.when(c, 1).otherwise(0).cast("bigint")

    return s.select(
        "doc_id",
        F.round(s1 / (255.0 * npx), 6).alias("brightness"),
        F.round(F.sqrt(s2 / npx - (s1 / npx) * (s1 / npx)), 6)
        .alias("rms_contrast"),
        bit(p_dark).alias("pass_dark"),
        bit(p_bright).alias("pass_bright"),
        bit(p_contrast).alias("pass_contrast"),
        bit(p_dark & p_bright & p_contrast).alias("keep"))


# ViT patchify geometry: the 16x16 raster splits into PATCH x PATCH
# non-overlapping patches (4x4 of them), each serialized row-major into
# a token string whose 32-bit hash quantizes to a _VIT_VOCAB-entry
# patch vocabulary (the discrete-VAE/BEiT-style token id).
_VIT_PATCH = 4
_VIT_VOCAB = 4096


@query("multimodal_vit_patch_plan", oracle=f"""
WITH px AS (
  SELECT d.doc_id, r.i,
         CASE WHEN r.i < octet_length(encode(d.text))
              THEN ascii(substr(d.text, CAST(r.i + 1 AS INTEGER), 1))
              ELSE 0 END AS v
  FROM documents d CROSS JOIN range({RASTER_H * RASTER_W}) r(i)
),
cells AS (
  SELECT doc_id, i, v,
         (i // {RASTER_W}) // {_VIT_PATCH} AS pr,
         (i % {RASTER_W}) // {_VIT_PATCH} AS pc
  FROM px
),
patches AS (
  SELECT doc_id, pr, pc,
         CAST(pr * {RASTER_W // _VIT_PATCH} + pc AS BIGINT) AS patch_idx,
         CAST(sum(v) AS BIGINT) AS patch_sum,
         string_agg(CAST(v AS VARCHAR), ':' ORDER BY i) AS s
  FROM cells GROUP BY doc_id, pr, pc
)
SELECT doc_id, patch_idx, CAST(pr AS BIGINT) AS pos_row,
       CAST(pc AS BIGINT) AS pos_col, patch_sum,
       ('0x' || substr(md5(s), 1, 8))::BIGINT % {_VIT_VOCAB}
         AS patch_token
FROM patches
""")
def multimodal_vit_patch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT-STYLE PATCHIFY PLAN (Dosovitskiy et al. 2020 "an image is
    worth 16x16 words"; token ids per patch are the BEiT/discrete-VAE
    variant): decode the binary payload as the headerless
    {RASTER_H}x{RASTER_W} raster (multimodal_decode_pool's geometry),
    split it into {_VIT_PATCH}x{_VIT_PATCH} non-overlapping patches,
    and emit per patch the SEQUENCE PLAN a vision-transformer training
    pipeline materializes: row-major patch index, 2-D position
    (pos_row, pos_col — the position-embedding key), the exact integer
    pixel sum, and a {_VIT_VOCAB}-entry patch-vocabulary token id
    (32-bit content hash of the serialized patch bytes — swapping the
    hash for a learned dVAE codebook lookup changes no plumbing).

    Determinism: patch sums are pure int64; the token id hashes a
    canonical ':'-joined decimal serialization of the patch bytes (NOT
    the raw bytes — NUL padding has no portable VARCHAR form), identical
    in both engines by construction.

    Scale shape: one narrow mapInPandas pass, {RASTER_H * RASTER_W //
    (_VIT_PATCH * _VIT_PATCH)} rows out per image, zero shuffles — the
    patchify stage of a 100 TB image corpus is embarrassingly parallel
    and this plan keeps it that way (the downstream groupBy/pack steps
    are corpus_sequence_pack's problem, already bounded)."""
    import hashlib

    import numpy as np

    docs = load(spark, sf_dir, "documents")
    mm = attach_binary_payload(docs)
    n_px = RASTER_H * RASTER_W
    hp, wp = RASTER_H // _VIT_PATCH, RASTER_W // _VIT_PATCH

    def patchify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, prs, pcs, sums, toks = [], [], [], [], []
            for did, b in zip(pdf["doc_id"], pdf["payload"]):
                raw = np.frombuffer(bytes(b)[:n_px], dtype=np.uint8)
                if raw.size < n_px:
                    raw = np.pad(raw, (0, n_px - raw.size))
                img = raw.reshape(RASTER_H, RASTER_W).astype(np.int64)
                for pr in range(hp):
                    for pc in range(wp):
                        patch = img[pr * _VIT_PATCH:(pr + 1) * _VIT_PATCH,
                                    pc * _VIT_PATCH:(pc + 1) * _VIT_PATCH]
                        flat = patch.ravel()
                        s = ":".join(str(int(v)) for v in flat)
                        h = int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
                        ids.append(did)
                        prs.append(pr)
                        pcs.append(pc)
                        sums.append(int(flat.sum()))
                        toks.append(h % _VIT_VOCAB)
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "pos_row": pd.Series(prs, dtype="int64"),
                "pos_col": pd.Series(pcs, dtype="int64"),
                "patch_sum": pd.Series(sums, dtype="int64"),
                "patch_token": pd.Series(toks, dtype="int64"),
            })

    out = mm.mapInPandas(
        patchify,
        "doc_id bigint, pos_row bigint, pos_col bigint, "
        "patch_sum bigint, patch_token bigint")
    return out.select(
        "doc_id",
        (F.col("pos_row") * wp + F.col("pos_col")).alias("patch_idx"),
        "pos_row", "pos_col", "patch_sum", "patch_token")


# Landmark fingerprinting geometry: frame energies over FRAME-byte
# windows, local peaks (strict maximum among +-_LM_HALO neighbors),
# each peak paired with its next _LM_FANOUT peaks, landmark hash
# quantized to _LM_BITS bits.
_LM_HALO, _LM_FANOUT, _LM_BITS = 2, 3, 20


@query("multimodal_audio_landmark_fingerprint", oracle=f"""
WITH f AS (
  SELECT d.doc_id, r.f AS frame_id,
         CAST(octet_length(encode(d.text)) AS BIGINT) AS blen, d.text
  FROM documents d CROSS JOIN range({_MAX_FRAMES}) r(f)
  WHERE r.f * {FRAME} < octet_length(encode(d.text))
),
px AS (
  SELECT doc_id, frame_id,
         CASE WHEN frame_id * {FRAME} + b.i < blen
              THEN ascii(substr(text,
                   CAST(frame_id * {FRAME} + b.i + 1 AS INTEGER), 1))
              ELSE 0 END AS v
  FROM f CROSS JOIN range({FRAME}) b(i)
),
en AS (
  SELECT doc_id, frame_id, CAST(sum(v) AS BIGINT) AS e
  FROM px GROUP BY doc_id, frame_id
),
pk AS (
  SELECT doc_id, frame_id, e
  FROM (
    SELECT doc_id, frame_id, e,
           coalesce(lag(e, 1) OVER w, -1) AS l1,
           coalesce(lag(e, 2) OVER w, -1) AS l2,
           coalesce(lead(e, 1) OVER w, -1) AS r1,
           coalesce(lead(e, 2) OVER w, -1) AS r2
    FROM en
    WINDOW w AS (PARTITION BY doc_id ORDER BY frame_id))
  WHERE e > l1 AND e > l2 AND e > r1 AND e > r2
),
pairs AS (
  SELECT a.doc_id, a.frame_id AS f1, b.frame_id AS f2,
         a.e AS e1, b.e AS e2,
         row_number() OVER (PARTITION BY a.doc_id, a.frame_id
                            ORDER BY b.frame_id) AS fan
  FROM pk a JOIN pk b ON b.doc_id = a.doc_id
                     AND b.frame_id > a.frame_id
),
lm AS (
  SELECT doc_id, f1, f2, e1, e2 FROM pairs WHERE fan <= {_LM_FANOUT}
)
SELECT doc_id, CAST(f1 AS BIGINT) AS f1, CAST(f2 AS BIGINT) AS f2,
       ('0x' || substr(md5(CAST(e1 AS VARCHAR) || ':' ||
                           CAST(e2 AS VARCHAR) || ':' ||
                           CAST(f2 - f1 AS VARCHAR)), 1, 8))::BIGINT
         % {2 ** _LM_BITS} AS landmark
FROM lm
""")
def multimodal_audio_landmark_fingerprint(spark: SparkSession,
                                          sf_dir: str) -> DataFrame:
    """LANDMARK AUDIO FINGERPRINTING (Wang 2003 — the Shazam
    constellation scheme): frame the payload into {FRAME}-byte energy
    frames (the multimodal_audio_energy grid), pick LOCAL PEAKS
    (strict maximum within +-{_LM_HALO} frames — the constellation
    points), pair each peak with its next {_LM_FANOUT} peaks, and hash
    (energy1, energy2, time-delta) into a {_LM_BITS}-bit landmark —
    the inverted-index key that makes audio lookup a hash join instead
    of a signal alignment. Production replaces frame energy with STFT
    peak (frequency, time) pairs; every Spark-side mechanism — framing,
    peak windows, fan-out pairing, landmark hashing, the downstream
    hash-join lookup — is identical.

    Determinism: energies are integer byte sums; a peak must be
    STRICTLY greater than all four halo neighbors (explicit lag/lead
    comparisons — plateaus yield no peak, so no first-of-ties rule is
    ever exercised); landmark hashes a canonical decimal
    serialization.

    Scale shape: framing + energies are one narrow pass; peaks come
    from a doc-partitioned window (never global); the pair fan-out is
    bounded at {_LM_FANOUT} per peak by a ranked self-join within the
    doc key. A petabyte of audio fingerprints in one shuffle on
    doc_id; the landmark index build is then sketch_bloom_membership's
    groupBy shape."""
    docs = load(spark, sf_dir, "documents")
    mm = attach_binary_payload(docs)

    def energies(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        for pdf in batches:
            ids, fids, es = [], [], []
            for did, b in zip(pdf["doc_id"], pdf["payload"]):
                raw = np.frombuffer(bytes(b), dtype=np.uint8)
                nfr = (len(raw) + FRAME - 1) // FRAME
                for fr in range(nfr):
                    ids.append(did)
                    fids.append(fr)
                    es.append(int(raw[fr * FRAME:(fr + 1) * FRAME]
                                  .astype(np.int64).sum()))
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_id": pd.Series(fids, dtype="int64"),
                "e": pd.Series(es, dtype="int64")})

    en = mm.mapInPandas(energies,
                        "doc_id bigint, frame_id bigint, e bigint")
    from pyspark.sql import Window as W
    w = W.partitionBy("doc_id").orderBy("frame_id")
    pk = en
    for name, off in (("l1", -1), ("l2", -2), ("r1", 1), ("r2", 2)):
        fn = F.lag("e", -off) if off < 0 else F.lead("e", off)
        pk = pk.withColumn(name, F.coalesce(fn.over(w), F.lit(-1)))
    pk = (pk.filter((F.col("e") > F.col("l1")) & (F.col("e") > F.col("l2"))
                    & (F.col("e") > F.col("r1"))
                    & (F.col("e") > F.col("r2")))
          .select("doc_id", "frame_id", "e"))
    b = pk.select(F.col("doc_id").alias("d2"),
                  F.col("frame_id").alias("f2"), F.col("e").alias("e2"))
    fan = F.row_number().over(
        W.partitionBy("doc_id", "frame_id").orderBy("f2"))
    pairs = (pk.join(b, (F.col("d2") == F.col("doc_id"))
                     & (F.col("f2") > F.col("frame_id")))
             .withColumn("fan", fan).filter(F.col("fan") <= _LM_FANOUT))
    lmhash = (F.conv(F.substring(F.md5(F.concat_ws(
        ":", F.col("e"), F.col("e2"), F.col("f2") - F.col("frame_id"))),
        1, 8), 16, 10).cast("long") % (2 ** _LM_BITS))
    return pairs.select("doc_id",
                        F.col("frame_id").alias("f1"), "f2",
                        lmhash.alias("landmark"))


# Global-window SSIM constants: C1 = (0.01*255)^2 = 6.5025, C2 =
# (0.03*255)^2 = 58.5225 (Wang et al. 2004's standard K1/K2) carried as
# exact rationals over 1e4 so the whole statistic stays integer.
_SSIM_C1_E4 = 65025
_SSIM_C2_E4 = 585225
_SSIM_N = RASTER_H * RASTER_W


def _ssim_oracle() -> str:
    # Worker-side import order: this runs at decoration time, and a
    # Python worker unpickling any multimodal pandas UDF imports THIS
    # module standalone — the producer must register first (the
    # corpus_hygiene module-import convention; without it every
    # multimodal UDF dies with KeyError on the executors).
    from . import dedup  # noqa: F401

    from ..registry import ORACLE_SQL
    n = _SSIM_N
    return f"""
WITH pairs AS ({ORACLE_SQL["dedup_minhash_lsh"]}),
px AS MATERIALIZED (
  SELECT d.doc_id, r.i,
         CASE WHEN r.i < octet_length(encode(d.text))
              THEN ascii(substr(d.text, CAST(r.i + 1 AS INTEGER), 1))
              ELSE 0 END AS v
  FROM documents d CROSS JOIN range({n}) r(i)),
mom AS MATERIALIZED (
  SELECT doc_id, CAST(sum(v) AS BIGINT) AS s,
         CAST(sum(v * v) AS BIGINT) AS ss
  FROM px GROUP BY doc_id),
sxy AS (
  SELECT p.doc_a, p.doc_b, CAST(sum(a.v * b.v) AS BIGINT) AS xy
  FROM pairs p
  JOIN px a ON a.doc_id = p.doc_a
  JOIN px b ON b.doc_id = p.doc_b AND b.i = a.i
  GROUP BY 1, 2),
stats AS (
  SELECT p.doc_a, p.doc_b,
         ma.s AS sx, mb.s AS sy, ma.ss AS sxx, mb.ss AS syy, sxy.xy
  FROM pairs p
  JOIN mom ma ON ma.doc_id = p.doc_a
  JOIN mom mb ON mb.doc_id = p.doc_b
  JOIN sxy ON sxy.doc_a = p.doc_a AND sxy.doc_b = p.doc_b)
SELECT doc_a, doc_b,
       CAST(sxx + syy - 2 * xy AS BIGINT) AS l2_sq,
       CAST(
         (CAST(2 * sx * sy * 10000 + {_SSIM_C1_E4 * n * n} AS HUGEINT)
          * (2 * ({n} * xy - sx * sy) * 10000
             + {_SSIM_C2_E4 * n * n})
          * 1000000)
         // (CAST((sx * sx + sy * sy) * 10000
                  + {_SSIM_C1_E4 * n * n} AS HUGEINT)
             * (({n} * sxx - sx * sx) * 10000
                + ({n} * syy - sy * sy) * 10000
                + {_SSIM_C2_E4 * n * n}))
         AS BIGINT) AS ssim_e6
FROM stats
"""


@query("multimodal_ssim_pairs", eager=True, oracle=_ssim_oracle())
def multimodal_ssim_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRUCTURAL SIMILARITY (SSIM, Wang et al. 2004) between the
    decoded rasters of near-duplicate candidate pairs — the PIXEL-level
    verifier completing the near-dup verification ladder: Jaccard
    (shingle bags) -> BLEU-2 (token order, text_bleu_pairs) -> SSIM
    (decoded payload structure), exactly the cascade a multimodal
    corpus build runs before dropping a "duplicate" image. Global
    window over the {RASTER_H}x{RASTER_W} raster (production tiles
    8x8 windows and averages; one window IS one tile's arithmetic).

    ALL-INTEGER: SSIM's luminance/contrast/covariance terms multiply
    out to exact int64 sums (Sx, Sy, Sxx, Syy, Sxy), the K1/K2
    constants are carried as rationals over 1e4, and the final ratio
    is one HUGEINT/DECIMAL(38) truncating division to ssim_e6 —
    engine-identical including the negative (anti-correlated) range,
    where both engines truncate toward zero (verified). l2_sq =
    Sxx + Syy - 2Sxy comes free as the MSE-family cross-check (SSIM=1
    <=> l2_sq=0 on these rasters, test-pinned).

    Scale shape: the decode is the family's Arrow-batched mapInPandas
    (one pass, 256 ints out per doc); moments are per-doc aggregates
    over the raster arrays JVM-side (F.aggregate / F.zip_with, no
    Python in the pair path); pair work is LSH-candidate-sized.
    Reference scope: no multimodal surface in the reference (SURVEY
    §2.5); declared extension."""
    from ..shipping import ensure_shipped
    ensure_shipped(spark)
    import numpy as np

    from .dedup import dedup_minhash_lsh

    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    docs = load(spark, sf_dir, "documents")
    mm = attach_binary_payload(docs)
    n = _SSIM_N

    def rasters(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, arrs = [], []
            for did, b in zip(pdf["doc_id"], pdf["payload"]):
                raw = np.frombuffer(bytes(b)[:n], dtype=np.uint8)
                if raw.size < n:
                    raw = np.pad(raw, (0, n - raw.size))
                ids.append(did)
                arrs.append(raw.astype(np.int64).tolist())
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "px": pd.Series(arrs)})

    # materialized ONCE (eager, registry metadata): the pair join reads
    # this frame on BOTH sides, and recomputing the lazy mapInPandas
    # decode twice over the whole corpus was measured 21x at 10x docs
    # (6.2s sf0.1 -> 130s sf1); checkpointed, the decode is one pass
    # and the joins read the raster-table bytes (n x 256 ints)
    px = mm.mapInPandas(rasters, "doc_id bigint, px array<bigint>")\
        .localCheckpoint()
    zero = F.lit(0).cast("bigint")
    a = px.select(F.col("doc_id").alias("doc_a"), F.col("px").alias("pa"))
    b = px.select(F.col("doc_id").alias("doc_b"), F.col("px").alias("pb"))
    j = pairs.join(a, "doc_a").join(b, "doc_b").select(
        "doc_a", "doc_b",
        F.aggregate("pa", zero, lambda acc, x: acc + x).alias("sx"),
        F.aggregate("pb", zero, lambda acc, x: acc + x).alias("sy"),
        F.aggregate("pa", zero, lambda acc, x: acc + x * x).alias("sxx"),
        F.aggregate("pb", zero, lambda acc, x: acc + x * x).alias("syy"),
        F.aggregate(F.zip_with("pa", "pb", lambda x, y: x * y), zero,
                    lambda acc, x: acc + x).alias("xy"))
    nn = n * n
    ssim = F.expr(
        f"CAST((CAST(2 * sx * sy * 10000 + {_SSIM_C1_E4 * nn} "
        f"AS DECIMAL(38,0)) "
        f"* (2 * ({n} * xy - sx * sy) * 10000 + {_SSIM_C2_E4 * nn}) "
        f"* 1000000) "
        f"DIV (CAST((sx * sx + sy * sy) * 10000 + {_SSIM_C1_E4 * nn} "
        f"AS DECIMAL(38,0)) "
        f"* (({n} * sxx - sx * sx) * 10000 "
        f"+ ({n} * syy - sy * sy) * 10000 + {_SSIM_C2_E4 * nn})) "
        f"AS BIGINT)")
    return j.select(
        "doc_a", "doc_b",
        (F.col("sxx") + F.col("syy") - 2 * F.col("xy")).cast("bigint")
        .alias("l2_sq"),
        ssim.alias("ssim_e6"))


# Block-motion search geometry: same FRAME-byte frames as frame_sample;
# candidate integer shifts ordered by the (|s|, s) preference the argmin
# tiebreak applies.
_MOT_SH = 2
_MOT_SHIFTS = (0, -1, 1, -2, 2)


@query("multimodal_block_motion", oracle=f"""
WITH f AS (
  SELECT doc_id, text, octet_length(encode(text)) AS blen
  FROM documents),
pr AS (
  SELECT p.doc_id, p.text, p.blen, r.t
  FROM f p CROSS JOIN range({_MAX_FRAMES - 1}) r(t)
  WHERE (r.t + 1) * {FRAME} < p.blen),
sh AS (SELECT unnest([-{_MOT_SH}, -1, 0, 1, {_MOT_SH}]) AS s),
cell AS (
  SELECT p.doc_id, p.t, sh.s, b.i,
         CASE WHEN p.t * {FRAME} + b.i + greatest(sh.s, 0) < p.blen
              THEN ascii(substr(p.text,
                   CAST(p.t * {FRAME} + b.i + greatest(sh.s, 0) + 1
                        AS INTEGER), 1))
              ELSE 0 END AS va,
         CASE WHEN (p.t + 1) * {FRAME} + b.i + greatest(-sh.s, 0) < p.blen
              THEN ascii(substr(p.text,
                   CAST((p.t + 1) * {FRAME} + b.i + greatest(-sh.s, 0) + 1
                        AS INTEGER), 1))
              ELSE 0 END AS vb
  FROM pr p CROSS JOIN sh CROSS JOIN range({FRAME}) b(i)
  WHERE b.i < {FRAME} - abs(sh.s)),
sads AS (
  SELECT doc_id, t, s,
         (1000000 * sum(abs(va - vb))) // ({FRAME} - abs(s)) AS mad_e6
  FROM cell GROUP BY doc_id, t, s),
best AS (
  SELECT doc_id, t, s, mad_e6,
         row_number() OVER (PARTITION BY doc_id, t
                            ORDER BY mad_e6, abs(s), s) AS rk
  FROM sads)
SELECT doc_id, CAST(t AS BIGINT) AS frame_id,
       CAST(s AS BIGINT) AS best_shift,
       CAST(mad_e6 AS BIGINT) AS mad_e6
FROM best WHERE rk = 1
""")
def multimodal_block_motion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLOCK-MATCHING MOTION ESTIMATION between consecutive frames —
    the integer-pel search at the heart of every video codec's motion
    compensation (MPEG/H.26x full-search over a +-{_MOT_SH} window) and
    the cheap temporal-redundancy signal a video-corpus pipeline uses:
    near-static content (best mean-abs-diff ~ 0 at shift 0) is the
    frame-dedup candidate, a clean nonzero winner is camera pan, a
    high floor at every shift is a cut (multimodal_scene_cuts finds
    those; this op measures sub-frame MOTION the cut detector cannot).
    For each consecutive frame pair, score every integer shift by mean
    absolute difference over the overlapping extent (normalized in
    integer micro-units so different overlap widths compare fairly)
    and keep the argmin; ties prefer smaller |shift| then negative —
    the zero-motion-bias real encoders apply.

    The decode inside mapInPandas is NumPy slicing over the frame
    matrix — swapping in a real luma-plane decoder changes only the
    UDF body (multimodal_frame_sample convention); the oracle
    recomputes every (pair, shift, byte) cell relationally with the
    same zero-padding CASE.

    At 100 TB: a NARROW per-document map (frames never leave their
    payload), output rows are metadata-sized (pair count x 3 ints);
    the shift loop is a constant {len(_MOT_SHIFTS)}-wide stencil, so
    cost is one pass over media bytes."""
    import numpy as np

    docs = load(spark, sf_dir, "documents")
    mm = attach_binary_payload(docs)
    schema = ("doc_id bigint, frame_id bigint, best_shift bigint, "
              "mad_e6 bigint")

    def motion(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        shifts = np.array(_MOT_SHIFTS, dtype=np.int64)
        for pdf in batches:
            ids, fids, bests, mads = [], [], [], []
            for did, b in zip(pdf["doc_id"], pdf["payload"]):
                raw = np.frombuffer(bytes(b), dtype=np.uint8)
                if raw.size <= FRAME:      # <2 frames -> no pair
                    continue
                n_frames = -(-raw.size // FRAME)
                pad = n_frames * FRAME - raw.size
                fr = np.pad(raw, (0, pad)).reshape(
                    n_frames, FRAME).astype(np.int64)
                a, c = fr[:-1], fr[1:]
                cols = []
                for s in shifts:
                    if s >= 0:
                        d = np.abs(a[:, s:] - c[:, :FRAME - s])
                    else:
                        d = np.abs(a[:, :FRAME + s] - c[:, -s:])
                    cols.append((1000000 * d.sum(axis=1))
                                // (FRAME - abs(s)))
                mat = np.stack(cols, axis=1)
                # argmin returns the FIRST minimum; _MOT_SHIFTS is
                # ordered by (|s|, s), so ties resolve to the
                # zero-motion-biased shift exactly like the oracle's
                # (mad, abs(s), s) sort
                pick = np.argmin(mat, axis=1)
                npair = a.shape[0]
                ids.extend([did] * npair)
                fids.append(np.arange(npair, dtype=np.int64))
                bests.append(shifts[pick])
                mads.append(mat[np.arange(npair), pick])
            yield pd.DataFrame({
                "doc_id": np.asarray(ids, dtype=np.int64),
                "frame_id": (np.concatenate(fids) if fids
                             else np.empty(0, dtype=np.int64)),
                "best_shift": (np.concatenate(bests) if bests
                               else np.empty(0, dtype=np.int64)),
                "mad_e6": (np.concatenate(mads) if mads
                           else np.empty(0, dtype=np.int64)),
            })

    return mm.mapInPandas(motion, schema)


# ---------------------------------------------------------------------------
# Verified perceptual-hash dedup (bucket -> pixel-exact confirm).


def _phash_verified_oracle() -> str:
    n = RASTER_H * RASTER_W
    return f"""
WITH px AS MATERIALIZED (
  SELECT d.doc_id, r.i,
         CASE WHEN r.i < octet_length(encode(d.text))
              THEN ascii(substr(d.text, CAST(r.i + 1 AS INTEGER), 1))
              ELSE 0 END AS v
  FROM documents d CROSS JOIN range({n}) r(i)),
blk AS (
  SELECT doc_id, (i // {RASTER_W}) // {POOL} AS pr,
         (i % {RASTER_W}) // {POOL} AS pc, sum(v) AS s
  FROM px GROUP BY doc_id, pr, pc),
bits AS (
  SELECT a.doc_id,
         CASE WHEN a.s > nxt.s
              THEN CAST(pow(2, a.pr * {RASTER_W // POOL - 1} + a.pc)
                        AS BIGINT)
              ELSE 0 END AS bit
  FROM blk a JOIN blk nxt
    ON nxt.doc_id = a.doc_id AND nxt.pr = a.pr AND nxt.pc = a.pc + 1),
ph AS MATERIALIZED (
  SELECT doc_id, CAST(sum(bit) AS BIGINT) AS phash
  FROM bits GROUP BY doc_id),
grp AS MATERIALIZED (
  SELECT phash, min(doc_id) AS keep_id
  FROM ph GROUP BY phash HAVING count(*) >= 2),
mem AS MATERIALIZED (
  SELECT g.phash, g.keep_id, p.doc_id
  FROM grp g JOIN ph p ON p.phash = g.phash
  WHERE p.doc_id != g.keep_id),
l2 AS (
  SELECT m.phash, m.keep_id, m.doc_id,
         CAST(sum((pa.v - pb.v) * (pa.v - pb.v)) AS BIGINT) AS l2_sq
  FROM mem m
  JOIN px pa ON pa.doc_id = m.doc_id
  JOIN px pb ON pb.doc_id = m.keep_id AND pb.i = pa.i
  GROUP BY m.phash, m.keep_id, m.doc_id)
SELECT phash, CAST(keep_id AS BIGINT) AS keep_id,
       CAST(count(*) + 1 AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN l2_sq = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_exact,
       CAST(sum(CASE WHEN l2_sq > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_near,
       CAST(max(l2_sq) AS BIGINT) AS max_l2_sq
FROM l2 GROUP BY phash, keep_id
"""


@query("multimodal_phash_verified_dedup",
       oracle=_phash_verified_oracle())
def multimodal_phash_verified_dedup(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """VERIFIED perceptual-hash dedup — the bucket-then-confirm cascade
    an image-dedup pipeline actually ships (the image analog of the
    text ladder's minhash -> BLEU/SSIM verification): pHash collisions
    are CANDIDATES, not verdicts (a 15-bit dHash collides on distinct
    images), so every member of a colliding bucket is re-checked
    against the bucket keeper at PIXEL level (exact raster L2^2 — a
    member at l2_sq = 0 is byte-identical media and safe to hard-drop;
    l2_sq > 0 members are perceptual near-dups routed to the softer
    policy). Per bucket: member counts by verdict class and the
    worst-case pixel distance.

    Composition: the per-doc hash is the factored phash_df builder the
    report op shares; the pixel compare fetches rasters ONLY for
    bucket members (semi-join first — dup-volume-sized, never the
    corpus), then one zip_with difference per member pair, JVM-side.
    The oracle recomputes hash, buckets, and every (pair, pixel) cell
    relationally.

    Scale shape: hash pass is narrow; bucket groupBy keys on the
    64-bit hash; the verify join touches members only (each bucket
    keeper broadcast by hash key). At 100 TB the verify cost is
    candidate-volume x raster bytes — exactly the budget the cascade
    exists to bound."""
    import numpy as np

    ph = phash_df(spark, sf_dir)
    grp = (ph.groupBy("phash")
           .agg(F.count(F.lit(1)).alias("cnt"),
                F.min("doc_id").alias("keep_id"))
           .filter(F.col("cnt") >= 2)
           .select("phash", "keep_id"))
    # member table referenced 3x below (semi-join id set + the verify
    # join) — persist the dup-volume-sized frame so the hash pass runs
    # once (the sim_nndescent_round edge-table precedent)
    mem = (ph.join(grp, "phash")
           .filter(F.col("doc_id") != F.col("keep_id"))
           .select("phash", "keep_id", "doc_id")
           .persist())
    # decode rasters ONLY for bucket members + keepers: semi-join the
    # payload stream against the candidate id set BEFORE the decode
    # UDF — without this the two raster joins re-decoded the whole
    # corpus twice (review finding; the docstring's budget claim)
    needed = (mem.select("doc_id")
              .union(mem.select(F.col("keep_id").alias("doc_id")))
              .distinct())

    docs = load(spark, sf_dir, "documents")
    mm = attach_binary_payload(docs).join(needed, "doc_id", "semi")
    n_px = RASTER_H * RASTER_W
    schema = "doc_id bigint, raster array<bigint>"

    def rasters(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, rs = [], []
            for did, b in zip(pdf["doc_id"], pdf["payload"]):
                raw = np.frombuffer(bytes(b)[:n_px], dtype=np.uint8)
                if raw.size < n_px:
                    raw = np.pad(raw, (0, n_px - raw.size))
                ids.append(did)
                rs.append(raw.astype(np.int64).tolist())
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "raster": pd.Series(rs)})

    rast = mm.mapInPandas(rasters, schema)
    l2 = (mem.join(rast.select(F.col("doc_id"),
                               F.col("raster").alias("ra")), "doc_id")
          .join(rast.select(F.col("doc_id").alias("keep_id"),
                            F.col("raster").alias("rb")), "keep_id")
          .select("phash", "keep_id", "doc_id",
                  F.aggregate(
                      F.zip_with("ra", "rb",
                                 lambda x, y: (x - y) * (x - y)),
                      F.lit(0).cast("bigint"),
                      lambda acc, z: acc + z).alias("l2_sq")))
    return (l2.groupBy("phash", F.col("keep_id").cast("bigint")
                       .alias("keep_id"))
            .agg((F.count(F.lit(1)) + 1).cast("bigint").alias("n_docs"),
                 F.sum(F.when(F.col("l2_sq") == 0, 1).otherwise(0))
                 .cast("bigint").alias("n_exact"),
                 F.sum(F.when(F.col("l2_sq") > 0, 1).otherwise(0))
                 .cast("bigint").alias("n_near"),
                 F.max("l2_sq").cast("bigint").alias("max_l2_sq")))
