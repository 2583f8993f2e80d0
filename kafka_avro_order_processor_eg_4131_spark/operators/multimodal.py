"""Multimodal column operators: images/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio libraries, so the actual byte decode is
STUBBED (clearly marked below): when Pillow/soundfile are importable the
real decode runs; otherwise a deterministic fake derives "decoded"
metadata from the payload hash. Everything around the stub — schema,
partitioning, UDF signature, Arrow batch shape — is real and tested;
swapping in a real decoder changes only the inner function.

Scale notes: mapInPandas streams Arrow batches, so payload bytes never
materialize as Python lists; with ``spark.sql.files.maxPartitionBytes``
tuned, each task holds one batch of payloads at a time. Binary columns
of ~MB objects should use a blob-store pointer column instead — the
operator shape stays identical (pointer fetch inside the batch loop).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id long, mime string, n_bytes long, sha256 string, "
    "width int, height int, n_channels int"
)

FRAME_SCHEMA = "doc_id long, frame_idx int, frame_sha string"


def _pillow_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except Exception:
        return False


def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stand-in ingestion: materialize a binary payload column + typed
    metadata from the fixture's text (deterministic; in production this
    is the raw image/audio bytes column from the lakehouse table)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )


def decode_image_meta(payloads: DataFrame) -> DataFrame:
    """Decode stage: binary payload -> image metadata.

    STUB: without Pillow, width/height/channels are derived
    deterministically from the payload sha256 (so tests are exact);
    with Pillow, the real ``Image.open`` path runs. The mapInPandas
    plumbing (Arrow batches of binary, struct output) is identical
    either way.
    """
    use_pillow = _pillow_available()

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, blob, mime in zip(pdf["doc_id"], pdf["payload"], pdf["mime"]):
                raw = bytes(blob)
                digest = hashlib.sha256(raw).hexdigest()
                if use_pillow:  # pragma: no cover - not available in CI
                    import io

                    from PIL import Image

                    try:
                        img = Image.open(io.BytesIO(raw))
                        w, h = img.size
                        ch = len(img.getbands())
                    except Exception:
                        w = h = ch = -1
                else:
                    # deterministic fake decode (STUB)
                    w = int(digest[:4], 16) % 1920 + 1
                    h = int(digest[4:8], 16) % 1080 + 1
                    ch = int(digest[8], 16) % 3 + 1
                out.append(
                    {
                        "doc_id": int(doc_id),
                        "mime": str(mime),
                        "n_bytes": len(raw),
                        "sha256": digest,
                        "width": w,
                        "height": h,
                        "n_channels": ch,
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "mime",
                    "n_bytes",
                    "sha256",
                    "width",
                    "height",
                    "n_channels",
                ],
            )

    return payloads.mapInPandas(_decode, DECODE_SCHEMA)


def sample_frames(payloads: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame-sampling stage shape: one payload -> N "frames" (rows).
    STUB: frames are byte-slices of the payload; a video decoder would
    produce real frames — the explode-shaped mapInPandas contract
    (one input row -> many output rows) is what's being exercised."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(blob)
                for idx, start in enumerate(range(0, len(raw), every_n_bytes)):
                    chunk = raw[start : start + every_n_bytes]
                    out.append(
                        {
                            "doc_id": int(doc_id),
                            "frame_idx": idx,
                            "frame_sha": hashlib.sha256(chunk).hexdigest(),
                        }
                    )
            yield pd.DataFrame(out, columns=["doc_id", "frame_idx", "frame_sha"])

    return payloads.mapInPandas(_sample, FRAME_SCHEMA)
