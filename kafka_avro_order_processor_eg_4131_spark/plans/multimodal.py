"""Multimodal-column queries (north-star extension; operators in
operators/multimodal.py). All five stages are oracle-checked: the stub
decode/resize fakes are md5/sha-derived and therefore SQL-expressible,
so DuckDB recomputes them exactly (hex-digit reconstruction for the
fake dims, VARCHAR slicing for frames — the fixture text is pure ASCII
at every SF, verified, so VARCHAR ops equal byte ops). The feature
stage emits printf-formatted floats (catalog.py float-portability
rules) so the driver can hash the rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load, register
from ..operators import cache as C
from ..operators import multimodal as M


def _hexd(expr: str, p: int) -> str:
    """SQL: value 0-15 of the p-th (1-based) hex digit of ``expr``."""
    return f"(strpos('0123456789abcdef', substring({expr}, {p}, 1)) - 1)"


def _hexval(expr: str, start: int, n: int) -> str:
    """SQL: integer value of ``n`` hex digits of ``expr`` from ``start``."""
    terms = " + ".join(
        f"{_hexd(expr, start + i)} * {16 ** (n - 1 - i)}" for i in range(n)
    )
    return f"({terms})"


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


@register(
    "multimodal_decode_meta",
    oracle=f"""
    WITH p AS (
      SELECT doc_id, sha256(text) AS dg,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      FROM documents
    )
    SELECT doc_id,
           'application/octet-stream' AS mime,
           n_bytes,
           dg AS sha256,
           CAST({_hexval("dg", 1, 4)} % 1920 + 1 AS INT) AS width,
           CAST({_hexval("dg", 5, 4)} % 1080 + 1 AS INT) AS height,
           CAST({_hexd("dg", 9)} % 3 + 1 AS INT) AS n_channels
    FROM p
    """,
)
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode stage over binary payloads (STUBBED byte decode — dims are
    sha256-derived, which is exactly what the oracle recomputes — with
    real Arrow/mapInPandas plumbing; see operators/multimodal.py)."""
    d = load(spark, sf_dir, "documents")
    return M.decode_image_meta(M.attach_payload(d))


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH f AS (
      SELECT doc_id,
             unnest(generate_series(
               0, CAST(ceil(octet_length(encode(text)) / 64.0) AS INT) - 1
             )) AS frame_idx
      FROM documents
    )
    SELECT f.doc_id,
           CAST(frame_idx AS INT) AS frame_idx,
           sha256(lower(substring(hex(encode(d.text)),
                                  frame_idx * 128 + 1, 128))) AS frame_sha
    FROM f JOIN documents d ON f.doc_id = d.doc_id
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling stage: one payload row -> N frame rows (64-byte
    fake "frames"). frame_sha is sha256 of the LOWERCASE-HEX image of
    the frame bytes — the oracle slices the hex rendering (2 chars per
    byte, so BYTE-exact even when a frame boundary cuts a multi-byte
    character in half) because DuckDB has no BLOB substring/sha256;
    see operators/multimodal.py::sample_frames."""
    d = load(spark, sf_dir, "documents")
    return M.sample_frames(M.attach_payload(d))


@register(
    "multimodal_resize",
    oracle="""
    SELECT doc_id,
           CAST(224 AS INT) AS width,
           CAST(224 AS INT) AS height,
           sha256(repeat(sha256(text || '|224x224'), 6)) AS resized_sha
    FROM documents
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage: binary -> binary at uniform target dims (STUBBED
    resample emitting an ASCII hex digest stream — reps=6 at 224x224 —
    so DuckDB recomputes resized_sha exactly; real binary-in/binary-out
    Arrow contract; exact pytest coverage in tests/test_extensions.py)."""
    d = load(spark, sf_dir, "documents")
    return M.resize_images(M.attach_payload(d)).drop("resized_payload")


@register(
    "multimodal_features",
    oracle=f"""
    WITH hx AS (
      SELECT doc_id,
             regexp_replace(lower(hex(encode(text))), '(.).', '\\1', 'g') AS h2
      FROM documents
    ), b AS (
      SELECT doc_id,
             list_transform(
               generate_series(0, 15),
               k -> CAST(length(h2) - length(replace(
                      h2, substring('0123456789abcdef', k + 1, 1), ''
                    )) AS DOUBLE)
             ) AS hist
      FROM hx
    ), n AS (
      SELECT doc_id,
             hist,
             sqrt(list_sum(list_transform(hist, x -> x * x))) AS nrm
      FROM b
    )
    SELECT doc_id,
           array_to_string(
             list_transform(
               hist,
               x -> printf('%.6f', CAST(CAST(
                      CASE WHEN nrm > 0 THEN x / nrm ELSE x END
                    AS FLOAT) AS DOUBLE))
             ), ',') AS features_csv
    FROM n
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extract stage: byte-histogram embedding (REAL features,
    no stub — L2-normalized 16-bucket histogram of byte>>4, i.e. counts
    of the high hex digit of each byte). Emitted as a printf('%.6f')
    CSV string so the driver can hash rows (arrays are unhashable in
    its canonicalizer) and DuckDB can recompute it: the per-bucket
    counts are exact integers, the norm is an exact integer sum under
    one IEEE sqrt, and /, float-cast, and printf are bit-identical
    across engines (catalog.py float rules). Twin-tested against pure
    numpy in tests/test_extensions.py."""
    d = load(spark, sf_dir, "documents")
    feats = M.extract_features(M.attach_payload(d))
    return feats.select(
        "doc_id",
        F.array_join(
            F.transform(
                F.col("features"),
                lambda x: F.format_string("%.6f", x.cast("double")),
            ),
            ",",
        ).alias("features_csv"),
    )


_NF_BAND = 8  # length-band width for candidate generation
_NF_MAXDIFF = 8  # max byte-length difference for a candidate pair
_NF_THRESH = 0.999999  # cosine threshold on unit-norm features

_NF_DOT = (
    "list_reduce(list_transform(list_zip(a.fv, b.fv), x -> x[1] * x[2]),"
    " (acc, v) -> acc + v)"
)


@register(
    "multimodal_feature_near_pairs",
    oracle=f"""
    WITH hx AS (
      SELECT doc_id,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             regexp_replace(lower(hex(encode(text))), '(.).', '\\1', 'g') AS h2
      FROM documents
    ), b AS (
      SELECT doc_id, n_bytes,
             list_transform(
               generate_series(0, 15),
               k -> CAST(length(h2) - length(replace(
                      h2, substring('0123456789abcdef', k + 1, 1), ''
                    )) AS DOUBLE)
             ) AS hist
      FROM hx
    ), n AS (
      SELECT doc_id, n_bytes, hist,
             sqrt(list_sum(list_transform(hist, x -> x * x))) AS nrm
      FROM b
    ), f AS (
      SELECT doc_id, n_bytes, n_bytes // {_NF_BAND} AS band,
             list_transform(hist,
               x -> CAST(CAST(CASE WHEN nrm > 0 THEN x / nrm ELSE x END
                    AS FLOAT) AS DOUBLE)) AS fv
      FROM n
    ), cand AS (
      -- adjacency must be direction-agnostic in LENGTH while pairs are
      -- normalized by ID: the lower-id doc can sit in either band, so
      -- both adjacent orientations join (disjoint branches — no dedup)
      SELECT a.doc_id AS id1, b.doc_id AS id2,
             a.n_bytes AS len1, b.n_bytes AS len2, {_NF_DOT} AS cos
      FROM f a JOIN f b ON a.band = b.band AND a.doc_id < b.doc_id
      UNION ALL
      SELECT a.doc_id, b.doc_id, a.n_bytes, b.n_bytes, {_NF_DOT}
      FROM f a JOIN f b ON a.band + 1 = b.band AND a.doc_id < b.doc_id
      UNION ALL
      SELECT a.doc_id, b.doc_id, a.n_bytes, b.n_bytes, {_NF_DOT}
      FROM f a JOIN f b ON a.band = b.band + 1 AND a.doc_id < b.doc_id
    )
    SELECT id1, id2, cos
    FROM cand
    WHERE abs(len1 - len2) <= {_NF_MAXDIFF} AND cos >= {_NF_THRESH}
    """,
)
def multimodal_feature_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal dedup loop closed end to end: binary payload ->
    mapInPandas byte-histogram features (operators/multimodal.py, the
    REAL non-stub stage) -> near-duplicate pairs by feature cosine.
    Candidates come from a byte-length BAND equi-join (same or adjacent
    64-byte band, then an exact |len diff| <= 64 filter) — near-dup
    payloads have near-equal sizes, so this is the banding that
    replaces the all-pairs join at scale, same move as MinHash-LSH.
    Features are unit-norm so the left-fold dot IS the cosine; the
    oracle recomputes the exact float32-rounded features from hex
    nibble counts, so the whole decode->featurize->dedup pipeline is
    hash-checked.

    STRUCTURAL EXACT-DUP COLLAPSE (round-7, same move as the dedup
    family): the Python featurize UDF and the band self-join run over
    RAW-BYTE exact-duplicate group representatives only, then the pair
    relation expands back to member grain. The group key here is md5 of
    the payload bytes — NOT the dedup family's normalized-text
    fingerprint: this family's features, byte lengths, and bands are
    case- and whitespace-SENSITIVE, so only byte-identical docs may
    collapse. Exactness: equal payload => equal features/n_bytes/band,
    the three band branches are disjoint and band-invariant, the cos
    payload is group-invariant, and within-group pairs carry the rep's
    self-cos dot(fv,fv) under the same threshold (a zero-norm payload
    scores 0 and drops, exactly as raw). Measured: the 10x pathological
    sweep leg fell 111.7s -> see PLANS.md (it was the slowest plan in
    the round-7 sweep; the band join saw 10x occupancy = ~100x
    collision dots)."""
    from pyspark.sql import functions as F

    from ..functions.vectors import dot
    from ..operators import dedup as D

    m = _raw_rep_cached(spark, sf_dir)
    d_rep = load(spark, sf_dir, "documents").join(
        m.filter(F.col("id") == F.col("rep")).select(
            F.col("id").alias("doc_id")
        ),
        "doc_id",
        "left_semi",
    )
    feats = M.extract_features(M.attach_payload(d_rep))
    lens = d_rep.select(
        "doc_id", F.octet_length(F.encode(F.col("text"), "utf-8")).cast("bigint").alias("n_bytes")
    )
    f = (
        feats.join(lens, "doc_id")
        .select(
            "doc_id",
            "n_bytes",
            F.expr(f"n_bytes div {_NF_BAND}").alias("band"),
            F.col("features").alias("fv"),
        )
    )
    f = C.ephemeral(f)
    a = f.select(
        F.col("doc_id").alias("id1"), F.col("n_bytes").alias("len1"),
        F.col("band").alias("band1"), F.col("fv").alias("fv1"),
    )
    b = f.select(
        F.col("doc_id").alias("id2"), F.col("n_bytes").alias("len2"),
        F.col("band").alias("band2"), F.col("fv").alias("fv2"),
    )
    same = a.join(b, (F.col("band1") == F.col("band2")) & (F.col("id1") < F.col("id2")))
    # both adjacent orientations: the lower-ID doc may be in either band
    adj_up = a.join(
        b, (F.col("band1") + 1 == F.col("band2")) & (F.col("id1") < F.col("id2"))
    )
    adj_dn = a.join(
        b, (F.col("band1") == F.col("band2") + 1) & (F.col("id1") < F.col("id2"))
    )
    cand = same.unionByName(adj_up).unionByName(adj_dn)
    cos = dot(F.col("fv1"), F.col("fv2"))
    rep_pairs = (
        cand.filter(F.abs(F.col("len1") - F.col("len2")) <= _NF_MAXDIFF)
        .select("id1", "id2", cos.alias("cos"))
        .filter(F.col("cos") >= _NF_THRESH)
    )
    inter = D.expand_rep_pairs(m, rep_pairs, ["cos"])
    self_cos = f.select(
        F.col("doc_id").alias("id"),
        dot(F.col("fv"), F.col("fv")).alias("self_cos"),
    ).filter(F.col("self_cos") >= _NF_THRESH)
    intra = (
        D.intra_group_pairs(m, self_cos)
        .join(
            m.select(F.col("id").alias("id1"), "rep").join(
                self_cos.select(F.col("id").alias("rep"), "self_cos"), "rep"
            ),
            "id1",
        )
        .select("id1", "id2", F.col("self_cos").alias("cos"))
    )
    return inter.unionAll(intra)


def _raw_rep_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id, rep): RAW-BYTE exact-duplicate groups for the multimodal
    family — rep = MIN(doc_id) over md5(payload bytes). Distinct from
    plans/dedup.py's normalized-text map on purpose (see
    multimodal_feature_near_pairs docstring)."""

    def build() -> DataFrame:
        d = load(spark, sf_dir, "documents").select(
            "doc_id", F.md5(F.encode(F.col("text"), "utf-8")).alias("fp")
        )
        reps = d.groupBy("fp").agg(F.min("doc_id").alias("rep"))
        return d.join(reps, "fp").select(F.col("doc_id").alias("id"), "rep")

    return C.family(spark, "multimodal.exact_rep_raw", sf_dir, build)
