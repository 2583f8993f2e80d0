"""Multimodal-column queries (north-star extension; operators in
operators/multimodal.py). The payload-metadata query is fully
oracle-checked (octet_length/sha256 exist in both engines); the decode
and frame-sample stages exercise the mapInPandas plumbing and carry a
rows-only check plus exact pytest assertions (tests/test_multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load, register
from ..operators import multimodal as M


@register(
    "multimodal_payload_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS sha256
    FROM documents
    """,
)
def multimodal_payload_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload ingestion metadata: byte length + sha256 — the
    typed-metadata side of a multimodal column, all JVM-side."""
    d = load(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("sha256"),
    )


@register("multimodal_decode_meta", oracle=None)  # rows-only: mapInPandas stub stage
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode stage over binary payloads (STUBBED byte decode, real
    Arrow/mapInPandas plumbing — see operators/multimodal.py)."""
    d = load(spark, sf_dir, "documents")
    return M.decode_image_meta(M.attach_payload(d))


@register("multimodal_frame_sample", oracle=None)  # rows-only: 1->N mapInPandas stage
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling stage: one payload row -> N frame rows."""
    d = load(spark, sf_dir, "documents")
    return M.sample_frames(M.attach_payload(d))


@register("multimodal_resize", oracle=None)  # rows-only: mapInPandas stub stage
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage: binary -> binary at uniform target dims (STUBBED
    resample, real binary-in/binary-out Arrow contract; exact pytest
    coverage in tests/test_extensions.py)."""
    d = load(spark, sf_dir, "documents")
    return M.resize_images(M.attach_payload(d)).drop("resized_payload")


@register("multimodal_features", oracle=None)  # rows-only: pandas-twin-tested
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extract stage: byte-histogram embedding (REAL features,
    no stub — L2-normalized 16-bucket byte histogram), the array<float>
    contract a neural encoder would fill. Twin-tested against a pure
    numpy reference in tests/test_extensions.py."""
    d = load(spark, sf_dir, "documents")
    return M.extract_features(M.attach_payload(d))
