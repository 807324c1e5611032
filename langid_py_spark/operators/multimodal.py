"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio decode libraries are not available in this container, so the
DECODE step is stubbed (deterministic fake, clearly marked); everything
Spark-side — schema, batch iteration shape, partition sizing, UDF
signatures — is real and tested. Swapping the stub for PIL/librosa is a
one-function change inside `_decode_stub`.

Design for 100 TB of media: payloads stay opaque `binary` until the last
possible stage (no JVM<->Python copies of blobs except in the decode
stage itself); `mapInPandas` streams Arrow batches so one task never
materializes more than `maxRecordsPerBatch` blobs; metadata columns
travel beside the payload so filters (mime, size) push down BEFORE
decode.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, mime string, nbytes int, payload binary"
)

FEATURE_SCHEMA = (
    "media_id bigint, mime string, nbytes int, "
    "width int, height int, feat array<float>"
)


def synth_payload(i: int) -> tuple[str, int, bytes]:
    """Deterministic per-id fake (mime, nbytes, payload) — the single
    source of truth shared by synth_media AND scripts/make_golden.py, so
    a constant change here cannot silently desync the golden oracle."""
    rng = np.random.RandomState(9000 + int(i))
    nb = int(rng.randint(128, 2048))
    return ["image/png", "image/jpeg", "audio/wav"][int(i) % 3], nb, rng.bytes(nb)


def synth_media(spark, n: int = 64, partitions: int = 4) -> DataFrame:
    """Deterministic fake media table (seeded per media_id)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy()
            rows = []
            for i in ids:
                mime, nb, payload = synth_payload(int(i))
                rows.append((int(i), mime, nb, payload))
            yield pd.DataFrame(rows, columns=["media_id", "mime", "nbytes", "payload"])

    return spark.range(0, n, 1, numPartitions=partitions).mapInPandas(
        gen, schema=MEDIA_SCHEMA
    )


def _decode_stub(payload: bytes, mime: str) -> tuple[int, int, np.ndarray]:
    """STUB decode: real impl would be PIL.Image.open / soundfile.read.

    Deterministic fake derived from the payload bytes so tests are
    stable: "dimensions" from the first bytes, an 8-dim "feature" from
    byte histogram moments.
    """
    if not payload:
        raise NotImplementedError("empty payload; real decoder not bundled")
    w = 16 + payload[0] % 240
    h = 16 + payload[1 % len(payload)] % 240
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr >> 5, minlength=8).astype(np.float32)
    feat = hist / max(len(arr), 1)
    return w, h, feat


def decode_features(media: DataFrame) -> DataFrame:
    """mapInPandas decode/feature-extract stage (Arrow-batched)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {
                "media_id": b["media_id"],
                "mime": b["mime"],
                "nbytes": b["nbytes"],
                "width": [],
                "height": [],
                "feat": [],
            }
            for payload, mime in zip(b["payload"], b["mime"]):
                w, h, f = _decode_stub(bytes(payload), mime)
                out["width"].append(w)
                out["height"].append(h)
                out["feat"].append(f.tolist())
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 4) -> DataFrame:
    """'Frame sampling' analogue on opaque payloads: deterministic byte
    striding (stub for video frame extraction), JVM-side metadata math +
    Python only for the slice itself."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, mime, nb, payload in zip(
                b["media_id"], b["mime"], b["nbytes"], b["payload"]
            ):
                p = bytes(payload)
                rows.append((int(mid), mime, int(nb), p[::every_n]))
            yield pd.DataFrame(rows, columns=["media_id", "mime", "nbytes", "payload"])

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)
