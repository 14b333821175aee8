"""Multimodal (image/audio/video) column plumbing for training pipelines.

Engine-native addition (brief: multimodal columns).  Media payloads are
opaque ``binary`` columns + a typed metadata struct; decode / resize /
frame-sample / feature-extract run as Arrow-batched ``mapInPandas`` stages.
The image/audio codecs are NOT available in this environment, so the codec
call itself is stubbed: by default a deterministic fake decoder parses our
own 16-byte header (media synthesised by ``synth_media``); passing
``decoder="real"`` raises NotImplementedError at the exact seam where
PIL/ffmpeg would plug in.  Everything around the stub — schemas, batch
iteration, per-row error channels, partition sizing — is real and tested.

Media header layout (big-endian u32 each): magic 'CSMM', kind (0=img,
1=audio, 2=video), dim0 (width / sample-rate / n-frames), dim1 (height /
n-samples / fps*1000); payload bytes follow.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC = b"CSMM"
KINDS = {0: "image", 1: "audio", 2: "video"}

META_SCHEMA = (
    "media_id long, kind string, dim0 int, dim1 int, n_payload int, ok boolean"
)


def synth_media(spark, *, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table → (media_id, media binary).

    Payload bytes derive from (seed, media_id) closed-form, so the table is
    identical at any parallelism — the multimodal analogue of the
    deterministic web-page synthesiser.
    """
    def gen(pdfs):
        for pdf in pdfs:
            rows = []
            for mid in pdf["id"]:
                rng = np.random.RandomState((seed * 1000003 + int(mid)) % (2**32))
                kind = int(mid) % 3
                d0 = 8 + int(mid) % 24          # width / rate / frames
                d1 = 8 + (int(mid) * 7) % 24    # height / samples / fps
                n_payload = d0 * d1 if kind == 0 else d0 * 4
                payload = rng.randint(0, 256, n_payload, dtype=np.int64)
                blob = MAGIC + struct.pack(">III", kind, d0, d1) + bytes(
                    payload.astype(np.uint8)
                )
                rows.append((int(mid), blob))
            yield pd.DataFrame(rows, columns=["media_id", "media"])

    return spark.range(n).repartition(8).mapInPandas(
        gen, schema="media_id long, media binary"
    )


def _parse_header(blob: bytes):
    if blob is None or len(blob) < 16 or blob[:4] != MAGIC:
        return None
    kind, d0, d1 = struct.unpack(">III", blob[4:16])
    return kind, d0, d1, len(blob) - 16


def decode_metadata(media: DataFrame, *, decoder: str = "fake") -> DataFrame:
    """(media_id, kind, dim0, dim1, n_payload, ok) — typed metadata per blob;
    malformed blobs yield ok=false rather than failing the task (per-row
    error channel, the scale-safe behavior)."""
    if decoder == "real":
        raise NotImplementedError(
            "real codecs (PIL/ffmpeg) are not available in this environment; "
            "plug the library call into _parse_header's seam"
        )

    def run(pdfs):
        for pdf in pdfs:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["media"]):
                h = _parse_header(blob)
                if h is None:
                    rows.append((int(mid), None, None, None, None, False))
                else:
                    kind, d0, d1, np_ = h
                    rows.append(
                        (int(mid), KINDS.get(kind, "unknown"), d0, d1, np_, True)
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "dim0", "dim1", "n_payload", "ok"],
            )

    return media.select("media_id", "media").mapInPandas(run, schema=META_SCHEMA)


def image_resize_features(
    media: DataFrame, *, out_w: int = 4, out_h: int = 4,
) -> DataFrame:
    """(media_id, feat array<double>) — decode image payload, nearest-
    neighbor resize to out_w×out_h, emit the normalized pixel vector.
    The resize math is real numpy over the fake decoder's pixel buffer;
    a real decoder drops into the same seam."""
    schema = "media_id long, feat array<double>"

    def run(pdfs):
        for pdf in pdfs:
            ids, feats = [], []
            for mid, blob in zip(pdf["media_id"], pdf["media"]):
                h = _parse_header(blob)
                if h is None or h[0] != 0:
                    continue
                _, w, hgt, _ = h
                px = np.frombuffer(blob[16:16 + w * hgt], dtype=np.uint8)
                if len(px) < w * hgt:
                    continue
                img = px.reshape(hgt, w)
                yi = (np.arange(out_h) * hgt // out_h)
                xi = (np.arange(out_w) * w // out_w)
                small = img[np.ix_(yi, xi)].astype(float) / 255.0
                ids.append(int(mid))
                feats.append(small.ravel().tolist())
            yield pd.DataFrame({
                "media_id": pd.Series(ids, dtype="int64"),
                "feat": pd.Series(feats, dtype="object"),
            })

    return media.select("media_id", "media").mapInPandas(run, schema=schema)


def frame_sample(
    media: DataFrame, *, every: int = 4,
) -> DataFrame:
    """(media_id, frame_no) — exploded frame-sampling plan for video rows:
    one output row per sampled frame index (every ``every``-th frame).
    Frame extraction itself is the stubbed codec seam; the partition-
    preserving explode is the real Spark plumbing."""
    meta = decode_metadata(media)
    vids = meta.where((F.col("kind") == "video") & F.col("ok"))
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("dim0") - 1, F.lit(every))
        ).alias("frame_no"),
    )
