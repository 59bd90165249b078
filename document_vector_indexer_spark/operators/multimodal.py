"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched ``mapInPandas`` operators.

The container ships no image/audio libraries. Image kernels have a
REAL in-container tier anyway: ``decode_backend="stdlib"`` decodes
PNG/BMP/PNM from the public specs with nothing but ``zlib``/``struct``
(``sources.miniimage`` — same tier policy as the stdlib PDF parser,
never silent garbage). ``decode_backend="fake"`` (default) runs a
deterministic pure-Python stand-in whose outputs are pinned by
tests/golden/multimodal_golden.json; ``"pil"``/``"ffmpeg"`` raise
``NotImplementedError`` until the real libs are present (video has no
stdlib tier — codecs are not stdlib-implementable). Everything
Spark-side — schema, partition sizing, UDF signatures, batch shapes,
null/corrupt-row handling — is identical across backends and tested
(tests/test_multimodal.py, incl. real-bytes golden drop-in).

Scale design: media bytes ride in their own column so column pruning
skips them unless a kernel needs pixels; operators are mapInPandas
(per-partition Arrow batches), so throughput scales with executors and
no media blob ever passes through the driver. Partition sizing for
blob-heavy tables: keep ``spark.sql.files.maxPartitionBytes`` at
128 MB and rely on parquet row-group pruning for the metadata-only
queries.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Literal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),   # images/video
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),  # audio/video
    ]
)

Backend = Literal["fake", "stdlib", "pil", "ffmpeg"]


def _require_backend(backend: Backend) -> None:
    if backend in ("fake", "stdlib"):
        return
    raise NotImplementedError(
        f"decode backend {backend!r} needs media libraries not present in "
        "this environment; the Spark plumbing is identical — plug the real "
        "kernel into the same mapInPandas signature."
    )


def _fake_pixels(content: bytes, w: int, h: int) -> list[int]:
    """Deterministic pixel stand-in: sha256-seeded byte stream."""
    seed = hashlib.sha256(content).digest()
    need = w * h
    out = bytearray()
    counter = 0
    while len(out) < need:
        out.extend(hashlib.sha256(seed + counter.to_bytes(4, "big")).digest())
        counter += 1
    return list(out[:need])


def _decode_pixels(
    backend: Backend, content: bytes, meta_w: int, meta_h: int
) -> "tuple[int, int, list[int]] | None":
    """(w, h, grayscale pixels) or None for not-decodable content.

    ``fake``: sha256 stand-in at the METADATA dims (pinned by
    tests/golden/multimodal_golden.json). ``stdlib``: real PNG/BMP/PNM
    decode (``sources.miniimage``, public specs, zlib only) at the
    dims the IMAGE declares — metadata dims are advisory at ingest
    time and the pixels are the truth. Decode failures return None
    (corrupt media must never kill a 100 TB job; the operators emit a
    null-feature row, same rule the golden contract pins for
    null/empty content)."""
    if backend == "fake":
        return meta_w, meta_h, _fake_pixels(content, meta_w, meta_h)
    from document_vector_indexer_spark.sources import miniimage

    try:
        return miniimage.decode_image(content)
    except ValueError:
        return None


def image_features(
    df: DataFrame,
    backend: Backend = "fake",
    thumb: tuple[int, int] = (8, 8),
) -> DataFrame:
    """Decode images and emit fixed-size feature rows: a thumb x thumb
    mean-pooled grayscale thumbnail (as array<float>) + basic stats.
    Null/empty content yields a row with null features (corrupt media
    must never kill a 100 TB job)."""
    import pandas as pd

    _require_backend(backend)
    tw, th = thumb
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("thumbnail", T.ArrayType(T.FloatType())),
            T.StructField("mean_intensity", T.DoubleType()),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                content = r.content
                if content is None or len(content) == 0:
                    rows.append((r.media_id, 0, None, None))
                    continue
                decoded = _decode_pixels(
                    backend, bytes(content), int(r.width or tw), int(r.height or th)
                )
                if decoded is None:  # undecodable != job failure
                    rows.append((r.media_id, len(content), None, None))
                    continue
                w, h, px = decoded
                # mean-pool to thumb grid
                tn = []
                for ty in range(th):
                    for tx in range(tw):
                        xs = range(tx * w // tw, max(tx * w // tw + 1, (tx + 1) * w // tw))
                        ys = range(ty * h // th, max(ty * h // th + 1, (ty + 1) * h // th))
                        vals = [px[y * w + x] for y in ys for x in xs]
                        tn.append(float(sum(vals)) / len(vals))
                rows.append(
                    (r.media_id, len(content), tn, float(sum(px)) / len(px))
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "n_bytes", "thumbnail", "mean_intensity"]
            )

    return df.filter(F.col("kind") == "image").mapInPandas(run, schema=out_schema)


def image_stats(df: DataFrame, backend: Backend = "fake") -> DataFrame:
    """Per-image decoded stats as EXACT integers — the oracle-able face
    of the decode tier (sniffed format, decoded dims, grayscale pixel
    total). The stdlib tier's decode is deterministic pure arithmetic,
    so these columns can hash-match a DuckDB oracle over mirrored
    literals (unlike ``image_features``'s float pooling). Decoded dims
    are the pixels' truth — metadata dims are ignored except by the
    fake backend, which has no bytes to trust. Null/undecodable content
    yields null stat columns (corrupt media must never kill a 100 TB
    job)."""
    import pandas as pd

    _require_backend(backend)
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("fmt", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("px_total", T.LongType()),
        ]
    )
    cols = [f.name for f in out_schema.fields]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from document_vector_indexer_spark.sources import miniimage

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                content = r.content
                if content is None or len(content) == 0:
                    rows.append((r.media_id, None, None, None, None))
                    continue
                data = bytes(content)
                if backend == "fake":
                    w, h = int(r.width or 8), int(r.height or 8)
                    px = _fake_pixels(data, w, h)
                    rows.append((r.media_id, "fake", w, h, sum(px)))
                    continue
                fmt = miniimage.sniff_format(data)
                decoded = _decode_pixels(backend, data, 0, 0)
                if decoded is None:
                    rows.append((r.media_id, fmt, None, None, None))
                    continue
                w, h, px = decoded
                rows.append((r.media_id, fmt, w, h, sum(px)))
            yield pd.DataFrame(rows, columns=cols)

    return df.filter(F.col("kind") == "image").mapInPandas(run, schema=out_schema)


def image_resize(
    df: DataFrame,
    target: tuple[int, int] = (4, 4),
    backend: Backend = "fake",
) -> DataFrame:
    """Resize images to ``target`` (mean-pooled grayscale with the fake
    kernel; a real backend plugs PIL's resample into the same
    mapInPandas signature). Emits one row per image with the resized
    pixel array + new dims."""
    import pandas as pd

    _require_backend(backend)
    tw, th = target
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("pixels", T.ArrayType(T.FloatType())),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.content is None or len(r.content) == 0:
                    rows.append((r.media_id, tw, th, None))
                    continue
                decoded = _decode_pixels(
                    backend, bytes(r.content), int(r.width or tw), int(r.height or th)
                )
                if decoded is None:
                    rows.append((r.media_id, tw, th, None))
                    continue
                w, h, px = decoded
                resized = []
                for ty in range(th):
                    for tx in range(tw):
                        xs = range(tx * w // tw, max(tx * w // tw + 1, (tx + 1) * w // tw))
                        ys = range(ty * h // th, max(ty * h // th + 1, (ty + 1) * h // th))
                        vals = [px[y * w + x] for y in ys for x in xs]
                        resized.append(float(sum(vals)) / len(vals))
                rows.append((r.media_id, tw, th, resized))
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "pixels"])

    return df.filter(F.col("kind") == "image").mapInPandas(run, schema=out_schema)


def frame_sample(
    df: DataFrame,
    every_ms: int = 1000,
    backend: Backend = "fake",
) -> DataFrame:
    """Sample video frames every ``every_ms``: one output row per
    sampled frame with a content digest (stand-in for the decoded
    frame). Fan-out happens executor-side inside the UDF — the planner
    never sees per-frame rows until after the map."""
    import pandas as pd

    if backend == "stdlib":  # no public-spec stdlib video decode exists
        raise NotImplementedError(
            "frame_sample has no stdlib decode tier (video codecs are not "
            "stdlib-implementable); use backend='fake' or 'ffmpeg'."
        )
    _require_backend(backend)
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField("frame_digest", T.StringType()),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.content is None or not r.duration_ms:
                    continue
                for i, ts in enumerate(range(0, int(r.duration_ms), every_ms)):
                    digest = hashlib.sha256(
                        bytes(r.content) + ts.to_bytes(8, "big")
                    ).hexdigest()[:16]
                    rows.append((r.media_id, i, ts, digest))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "ts_ms", "frame_digest"]
            )

    return df.filter(F.col("kind") == "video").mapInPandas(run, schema=out_schema)


def media_stats(df: DataFrame) -> DataFrame:
    """Per-kind inventory aggregate (counts, blob bytes, durations)."""
    return df.groupBy("kind").agg(
        F.count("*").alias("n_items"),
        F.sum(F.coalesce(F.octet_length("content"), F.lit(0))).cast("long").alias(
            "total_bytes"
        ),
        F.max("duration_ms").alias("max_duration_ms"),
    )
