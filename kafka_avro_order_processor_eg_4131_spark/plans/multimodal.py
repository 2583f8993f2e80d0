"""Multimodal-column queries (north-star extension; operators in
operators/multimodal.py). All stages are oracle-checked.

Round 10: decode and resize are REAL — attach_png_payload generates
genuine PNGs (stdlib zlib/struct/crc32) whose dims/pixels follow a
pure integer formula of doc_id, the decode kernel parses the IHDR
chunk, and the resize kernel inflates + unfilters the raster and
nearest-neighbor resamples it. The oracles restate the generator
formula, so a green hash IS proof the encode -> parse -> resample loop
is byte-exact. The hash-derived stub survives only as the non-PNG
fallback (frame/feature/payload-meta stages keep the utf-8 text
payloads whose oracles use VARCHAR slicing — the fixture text is pure
ASCII at every SF, verified, so VARCHAR ops equal byte ops). The
feature stage emits printf-formatted floats (catalog.py
float-portability rules) so the driver can hash the rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load, register
from ..operators import cache as C
from ..operators import multimodal as M


def _png_payload_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session family cache of the generated PNG payload relation
    (doc_id, payload, mime, n_bytes). Two fixes in one (round-10
    verdict item 1a + advice): the documents scan is WIDENED before the
    compute-heavy Python encode kernel (CLAUDE.md: the single-file
    fixture otherwise runs the whole codec on one core — the same
    single-partition lesson as operators/dedup._widen), and the result
    is persisted so the decode-meta and resize entries share ONE
    generation pass instead of each regenerating every PNG. Payloads
    are tiny (~300 B each), so the cached relation is megabytes even at
    bench scale; at 100 TB this relation IS the lakehouse's raw image
    column and the generator disappears — the consumers' shape is
    unchanged."""
    from ..operators.dedup import _widen

    def build() -> DataFrame:
        d = load(spark, sf_dir, "documents").select("doc_id")
        return M.attach_png_payload(_widen(d))

    return C.family(spark, "multimodal.png_payload", sf_dir, build)


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
    SELECT doc_id,
           'image/png' AS mime,
           CAST(doc_id % {M.PNG_W_MOD} + {M.PNG_W_BASE} AS INT) AS width,
           CAST(doc_id % {M.PNG_H_MOD} + {M.PNG_H_BASE} AS INT) AS height,
           CAST(3 AS INT) AS n_channels,
           CAST(8 AS INT) AS bit_depth,
           CAST(2 AS INT) AS color_type
    FROM documents
    """,
)
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode (round-10, verdict item 4 — no Pillow needed):
    attach_png_payload generates a genuine tiny PNG per document
    (stdlib zlib/struct/crc32, all five scanline filters across the
    corpus) and the kernel parses the IHDR chunk — signature check, CRC
    verify, width/height/bit_depth/color_type — via functions/png.py.
    The oracle states the GENERATOR's ground truth (dims are a pure
    formula of doc_id), so the hash match proves the encode -> parse
    round trip byte-exactly on every row; any drift in chunk layout,
    CRC, or IHDR packing fails the gate. The former sha-derived stub
    is demoted to non-PNG payloads (pytest-covered). Payloads come from
    the shared widened family cache (_png_payload_cached) — one
    generation pass serves this entry and the resize entry."""
    return M.decode_image_meta(_png_payload_cached(spark, sf_dir)).select(
        "doc_id", "mime", "width", "height", "n_channels",
        "bit_depth", "color_type",
    )


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


_RESIZE_TW = _RESIZE_TH = 16  # thumbnail target for the registered plan

# pixel formula terms shared with operators/multimodal.py (generated
# from the same constants so the two sides cannot drift)
_PX_HEX = "printf('" + "%02x" * 3 + "', " + ", ".join(
    f"(did*{cd} + si*{ci} + sj*{cj}) % 256"
    for cd, ci, cj in M.PNG_PIXEL_COEF
) + ")"


@register(
    "multimodal_resize",
    oracle=f"""
    WITH g AS (
      SELECT doc_id,
             doc_id % {M.PNG_W_MOD} + {M.PNG_W_BASE} AS w,
             doc_id % {M.PNG_H_MOD} + {M.PNG_H_BASE} AS h
      FROM documents
    ),
    px AS (
      SELECT g.doc_id AS did, y.y, x.x,
             ((y.y * g.h) // {_RESIZE_TH}) AS si,
             ((x.x * g.w) // {_RESIZE_TW}) AS sj
      FROM g
      CROSS JOIN (SELECT unnest(generate_series(0, {_RESIZE_TH - 1})) AS y) y
      CROSS JOIN (SELECT unnest(generate_series(0, {_RESIZE_TW - 1})) AS x) x
    ),
    r AS (
      SELECT did AS doc_id,
             string_agg({_PX_HEX}, '' ORDER BY y, x) AS hx
      FROM px GROUP BY did
    )
    SELECT doc_id,
           CAST({_RESIZE_TW} AS INT) AS width,
           CAST({_RESIZE_TH} AS INT) AS height,
           sha256(hx) AS resized_sha
    FROM r
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resample (round-10, verdict item 4): decode the
    genuine PNG payload — zlib-inflate the IDAT stream, reverse the
    per-scanline filters (all five types appear in the corpus) — then
    nearest-neighbor resize the raster to a 16x16 thumbnail and
    re-encode as PNG (functions/png.py). resized_sha hashes the
    lowercase-hex image of the resized RASTER; the oracle recomputes
    every output pixel from the generator formula plus the identical
    floor-index resample math (out[y][x] = in[y*h//16][x*w//16]), so
    the hash match proves decode + unfilter + resample byte-exactly
    per document. The digest-stream stub survives only as the non-PNG
    fallback (pytest-covered). Payloads come from the shared widened
    family cache (_png_payload_cached) — the generation pass is paid
    once per session, not once per entry."""
    return M.resize_images(
        _png_payload_cached(spark, sf_dir),
        target_w=_RESIZE_TW,
        target_h=_RESIZE_TH,
    ).drop("resized_payload")


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
