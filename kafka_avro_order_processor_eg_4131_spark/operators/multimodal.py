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


RESIZE_SCHEMA = (
    "doc_id long, width int, height int, resized_payload binary, resized_sha string"
)

FEATURE_SCHEMA = "doc_id long, features array<float>"


def resize_images(payloads: DataFrame, target_w: int = 224, target_h: int = 224) -> DataFrame:
    """Resize stage: binary payload -> binary payload at target dims.

    STUB: without Pillow the "resized" bytes are a deterministic
    digest-stream of (payload, dims) — the binary-in/binary-out Arrow
    contract, output schema, and downstream hashability are real; with
    Pillow the actual ``Image.resize`` path runs. Target dims ride
    along so a training pipeline can assert uniformity downstream."""
    use_pillow = _pillow_available()

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(blob)
                if use_pillow:  # pragma: no cover - not available in CI
                    import io

                    from PIL import Image

                    try:
                        img = Image.open(io.BytesIO(raw)).resize((target_w, target_h))
                        buf = io.BytesIO()
                        img.save(buf, format="PNG")
                        resized = buf.getvalue()
                    except Exception:
                        resized = b""
                else:
                    # deterministic fake resize (STUB): ASCII hex digest
                    # stream sized proportionally to the target pixel
                    # count. Hex (not raw digest bytes) so the fake stays
                    # VARCHAR-representable and a SQL oracle can recompute
                    # resized_sha = sha256(repeat(sha256(text||dims), reps))
                    seed_hex = hashlib.sha256(
                        raw + f"|{target_w}x{target_h}".encode()
                    ).hexdigest()
                    reps = max(1, (target_w * target_h) // (32 * 256))
                    resized = (seed_hex * reps).encode("ascii")
                out.append(
                    {
                        "doc_id": int(doc_id),
                        "width": target_w,
                        "height": target_h,
                        "resized_payload": resized,
                        "resized_sha": hashlib.sha256(resized).hexdigest(),
                    }
                )
            yield pd.DataFrame(
                out,
                columns=["doc_id", "width", "height", "resized_payload", "resized_sha"],
            )

    return payloads.mapInPandas(_resize, RESIZE_SCHEMA)


def extract_features(payloads: DataFrame, dim: int = 16) -> DataFrame:
    """Feature-extract stage: binary payload -> float embedding.

    NOT a stub: the byte-value histogram pooled into ``dim`` buckets and
    L2-normalized is a real, library-free content feature (usable for
    embedding-cosine near-dup on arbitrary binary columns). A neural
    encoder would replace the inner function; the Arrow-batch shape and
    array<float> output contract are exactly what it would use."""
    import numpy as np

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(bytes(blob), dtype=np.uint8)
                if arr.size:
                    hist = np.bincount(arr >> (8 - dim.bit_length() + 1), minlength=dim)[
                        :dim
                    ].astype(np.float64)
                    nrm = np.linalg.norm(hist)
                    feats = (hist / nrm if nrm else hist).astype(np.float32)
                else:
                    feats = np.zeros(dim, dtype=np.float32)
                out.append({"doc_id": int(doc_id), "features": feats.tolist()})
            yield pd.DataFrame(out, columns=["doc_id", "features"])

    return payloads.mapInPandas(_extract, FEATURE_SCHEMA)


def sample_frames(payloads: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame-sampling stage shape: one payload -> N "frames" (rows).
    STUB: frames are byte-slices of the payload; a video decoder would
    produce real frames — the explode-shaped mapInPandas contract
    (one input row -> many output rows) is what's being exercised.

    frame_sha is sha256 over the LOWERCASE-HEX image of the frame
    bytes (round-9 text-edge pin): byte frames cut multi-byte payloads
    mid-codepoint, and DuckDB's sha256 accepts only VARCHAR — raw byte
    frames have no VARCHAR image, the hex rendering always does, on
    both engines. Still injective in the frame bytes."""

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
                            "frame_sha": hashlib.sha256(
                                chunk.hex().encode("ascii")
                            ).hexdigest(),
                        }
                    )
            yield pd.DataFrame(out, columns=["doc_id", "frame_idx", "frame_sha"])

    return payloads.mapInPandas(_sample, FRAME_SCHEMA)
