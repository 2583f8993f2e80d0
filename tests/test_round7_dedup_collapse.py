"""Round-7 structural exact-dup collapse: equivalence of the
rep-collapsed + expanded dedup families against the RAW member-grain
builds, on a deliberately pathological corpus the parquet fixtures do
not contain (the sf fixtures have zero empty docs and zero
sub-shingle-length docs — verified; these edge cases only live here).

The corpus stresses every branch of the expansion:
- multi-member exact-dup groups (including whitespace-only and
  case-only differences, which share the normalized-text fingerprint);
- a cross-group near-dup edge (jaccard ~0.89) so components must merge
  two cliques;
- a token-bearing group too short to shingle (SimHash/embedding pairs
  exist, MinHash pairs must NOT);
- empty / whitespace-only duplicate docs (absent from every family);
- a singleton with no duplicates or near-dups (absent from pair
  families, present in signatures).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_avro_order_processor_eg_4131_spark.operators import cache as C
from kafka_avro_order_processor_eg_4131_spark.operators import dedup as D

_LONG_A = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    " kilo lima mike november oscar papa quebec romeo sierra tango"
)
# one trailing token changed: 17 of 18+1 shingles shared -> jaccard 17/19
_LONG_A2 = _LONG_A.rsplit(" ", 1)[0] + " zulu"
_LONG_B = (
    "zero one two three four five six seven eight nine ten eleven"
    " twelve thirteen fourteen fifteen sixteen seventeen"
)

_DOCS = [
    (1, _LONG_A, "en", "web"),
    (2, _LONG_A, "en", "web"),  # exact dup of 1
    (3, "  " + _LONG_A.replace(" ", "  ") + " ", "en", "books"),  # ws-only diff
    (4, _LONG_A.upper(), "en", "web"),  # case-only diff -> same fingerprint
    (5, _LONG_A2, "en", "web"),  # near-dup of group{1,2,3,4}
    (6, _LONG_A2, "en", "news"),  # exact dup of 5
    (7, "tiny doc", "en", "web"),  # 2 tokens: no shingles
    (8, "tiny  doc", "en", "web"),  # same group as 7
    (9, "", "en", "web"),  # empty
    (10, "   ", "en", "web"),  # whitespace-only: same group as 9
    (11, _LONG_B, "en", "books"),  # singleton, unrelated
]


@pytest.fixture(scope="module")
def patho_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("patho_corpus")
    rows = [
        (i, t, lang, src, len(t)) for (i, t, lang, src) in _DOCS
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    yield str(d)
    C.release_families(spark)


def _docs(spark, patho_dir):
    from kafka_avro_order_processor_eg_4131_spark.catalog import load

    return load(spark, patho_dir, "documents")


def _pairs(df, cols=("id1", "id2")):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


class TestMinhashFamilyEquivalence:
    def test_signatures_match_raw(self, spark, patho_dir):
        from kafka_avro_order_processor_eg_4131_spark.plans.dedup import (
            _sigs_cached,
        )

        raw = D.minhash_signatures(D.shingle_rows(_docs(spark, patho_dir)))
        cols = ["id"] + [f"sig{h}" for h in range(D.NUM_HASHES)]
        assert _pairs(_sigs_cached(spark, patho_dir), cols) == _pairs(raw, cols)

    def test_candidates_match_raw(self, spark, patho_dir):
        from kafka_avro_order_processor_eg_4131_spark.plans.dedup import (
            _candidates_expanded,
        )

        sh = D.shingle_rows(_docs(spark, patho_dir))
        raw = D.candidate_pairs(D.lsh_buckets(D.minhash_signatures(sh)))
        got = _pairs(_candidates_expanded(spark, patho_dir))
        C.release_ephemeral(spark)
        assert got == _pairs(raw)
        # the exact-dup clique of group {1,2,3,4} must be present and the
        # shingle-less group {7,8} must NOT produce minhash candidates
        assert {(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)} <= set(got)
        assert (7, 8) not in set(got)

    def test_jaccard_match_raw(self, spark, patho_dir):
        from kafka_avro_order_processor_eg_4131_spark.plans.dedup import (
            _jaccard_expanded,
        )

        sh = D.shingle_rows(_docs(spark, patho_dir))
        cands = D.candidate_pairs(D.lsh_buckets(D.minhash_signatures(sh)))
        raw = D.jaccard_pairs(sh, cands)
        cols = ("id1", "id2", "jaccard")
        got = _pairs(_jaccard_expanded(spark, patho_dir), cols)
        C.release_ephemeral(spark)
        assert got == _pairs(raw, cols)
        by_pair = {(a, b): j for a, b, j in got}
        # within-group pairs are EXACTLY 1.0; the cross-group near-dup
        # (if LSH surfaced it — deterministic either way) is 17/19
        assert by_pair[(1, 2)] == 1.0
        if (1, 5) in by_pair:
            assert by_pair[(1, 5)] == 17.0 / 19.0

    def test_components_match_raw(self, spark, patho_dir):
        from kafka_avro_order_processor_eg_4131_spark.plans.dedup import (
            _components_expanded,
        )

        sh = D.shingle_rows(_docs(spark, patho_dir))
        cands = D.candidate_pairs(D.lsh_buckets(D.minhash_signatures(sh)))
        raw = D.connected_components(
            D.jaccard_pairs(sh, cands).filter(F.col("jaccard") >= 0.8)
        )
        cols = ("id", "component")
        got = _pairs(_components_expanded(spark, patho_dir), cols)
        C.release_ephemeral(spark)
        assert got == _pairs(raw, cols)
        comp = dict(got)
        # groups {1,2,3,4} and {5,6} form near-dup cliques; shingle-less
        # and empty docs never enter; the singleton is absent
        assert comp[1] == comp[2] == comp[3] == comp[4] == 1
        assert comp[5] == comp[6]
        for absent in (7, 8, 9, 10, 11):
            assert absent not in comp


class TestSimhashFamilyEquivalence:
    def test_signatures_match_raw(self, spark, patho_dir):
        from kafka_avro_order_processor_eg_4131_spark.plans.dedup import (
            _simhash_expanded,
        )

        raw = D.simhash(_docs(spark, patho_dir))
        cols = ("id", "simhash")
        got = _pairs(_simhash_expanded(spark, patho_dir), cols)
        assert got == _pairs(raw, cols)
        ids = {i for i, _ in got}
        # token-bearing docs (incl. the sub-shingle group) have
        # signatures; empty/whitespace docs do not
        assert {7, 8} <= ids and not ({9, 10} & ids)

    def test_near_pairs_match_raw(self, spark, patho_dir):
        from kafka_avro_order_processor_eg_4131_spark.plans.dedup import (
            _simhash_pairs_expanded,
        )

        raw = D.simhash_near_pairs(D.simhash(_docs(spark, patho_dir)))
        cols = ("id1", "id2", "hamming")
        got = _pairs(_simhash_pairs_expanded(spark, patho_dir), cols)
        C.release_ephemeral(spark)
        assert got == _pairs(raw, cols)
        # the sub-shingle exact-dup group IS a simhash pair at hamming 0
        assert (7, 8, 0) in set(got)


class TestEmbeddingFamilyEquivalence:
    def _raw_vectors(self, spark, patho_dir):
        """The pre-collapse member-grain vector build, restated as the
        reference twin (tokenize+hash per DOC, unweighted per-bucket
        mean over all docs)."""
        from kafka_avro_order_processor_eg_4131_spark.functions.text import (
            norm_tokens,
        )
        from kafka_avro_order_processor_eg_4131_spark.functions.vectors import (
            norm,
        )
        from kafka_avro_order_processor_eg_4131_spark.plans.dedup import _EMB_DIM

        d = _docs(spark, patho_dir).filter(F.trim(F.col("text")) != "")
        code = F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
        cnt = (
            d.select("doc_id", F.explode(norm_tokens(F.col("text"))).alias("tok"))
            .select("doc_id", (code % _EMB_DIM).cast("int").alias("bucket"))
            .groupBy("doc_id", "bucket")
            .agg(F.count("*").cast("double").alias("c"))
        )
        ndocs = d.agg(F.count("*").alias("n"))
        mean_row = (
            cnt.groupBy("bucket")
            .agg(F.sum("c").alias("s"))
            .agg(
                F.map_from_entries(
                    F.array_sort(F.collect_list(F.struct("bucket", "s")))
                ).alias("sm")
            )
            .crossJoin(F.broadcast(ndocs))
            .select(
                F.transform(
                    F.sequence(F.lit(0), F.lit(_EMB_DIM - 1)),
                    lambda i: F.coalesce(F.element_at("sm", i), F.lit(0.0))
                    / F.col("n"),
                ).alias("mvec")
            )
        )
        sparse = cnt.groupBy("doc_id").agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("bucket", "c")))
            ).alias("cm")
        )
        vec = sparse.crossJoin(F.broadcast(mean_row)).select(
            "doc_id",
            F.zip_with(
                F.transform(
                    F.sequence(F.lit(0), F.lit(_EMB_DIM - 1)),
                    lambda i: F.coalesce(F.element_at("cm", i), F.lit(0.0)),
                ),
                F.col("mvec"),
                lambda x, m: x - m,
            ).alias("vec"),
        )
        return vec.withColumn("nrm", norm(F.col("vec"))).filter(F.col("nrm") > 0)

    def test_vectors_match_raw(self, spark, patho_dir):
        """Weighted rep-grain mean == unweighted member-grain mean,
        bit-for-bit, and the expansion restores every member row."""
        from kafka_avro_order_processor_eg_4131_spark.plans.dedup import (
            _doc_vectors_cached,
        )

        def rows(df):
            return sorted(
                (r.doc_id, tuple(r.vec), r.nrm) for r in df.collect()
            )

        got = rows(_doc_vectors_cached(spark, patho_dir))
        raw = rows(self._raw_vectors(spark, patho_dir))
        C.release_ephemeral(spark)
        assert got == raw
        ids = {i for i, _, _ in got}
        assert {7, 8} <= ids and not ({9, 10} & ids)

    def test_near_pairs_match_raw(self, spark, patho_dir):
        from kafka_avro_order_processor_eg_4131_spark.operators import (
            similarity as S,
        )
        from kafka_avro_order_processor_eg_4131_spark.plans.dedup import (
            _COS_THRESHOLD,
            _LSH_BITS,
            _LSH_TABLES,
            _embedding_pairs_cached,
        )

        raw_e = self._raw_vectors(spark, patho_dir)
        planes = S.lsh_planes(
            raw_e, _LSH_TABLES, _LSH_BITS, id_col="doc_id", vec_col="vec"
        )
        raw = S.lsh_near_pairs_fused(
            raw_e, planes, _COS_THRESHOLD, id_col="doc_id", vec_col="vec"
        )
        cols = ("id1", "id2", "cos")
        got = _pairs(_embedding_pairs_cached(spark, patho_dir), cols)
        C.release_ephemeral(spark)
        assert got == _pairs(raw, cols)
        # every exact-dup pair must appear with its self-cosine (the
        # exact IEEE d/(sqrt(d)^2) value, whatever ulp it lands on)
        got_pairs = {(a, b) for a, b, _ in got}
        assert {(1, 2), (1, 3), (1, 4), (5, 6), (7, 8)} <= got_pairs


class TestMultimodalFamilyEquivalence:
    def _raw_near_pairs(self, spark, patho_dir):
        """The pre-collapse member-grain band join, restated as the
        reference twin."""
        from kafka_avro_order_processor_eg_4131_spark.functions.vectors import dot
        from kafka_avro_order_processor_eg_4131_spark.operators import (
            multimodal as M,
        )
        from kafka_avro_order_processor_eg_4131_spark.plans.multimodal import (
            _NF_BAND,
            _NF_MAXDIFF,
            _NF_THRESH,
        )

        d = _docs(spark, patho_dir)
        feats = M.extract_features(M.attach_payload(d))
        lens = d.select(
            "doc_id",
            F.octet_length(F.encode(F.col("text"), "utf-8"))
            .cast("bigint")
            .alias("n_bytes"),
        )
        f = feats.join(lens, "doc_id").select(
            "doc_id",
            "n_bytes",
            F.expr(f"n_bytes div {_NF_BAND}").alias("band"),
            F.col("features").alias("fv"),
        )
        a = f.select(
            F.col("doc_id").alias("id1"), F.col("n_bytes").alias("len1"),
            F.col("band").alias("band1"), F.col("fv").alias("fv1"),
        )
        b = f.select(
            F.col("doc_id").alias("id2"), F.col("n_bytes").alias("len2"),
            F.col("band").alias("band2"), F.col("fv").alias("fv2"),
        )
        same = a.join(
            b, (F.col("band1") == F.col("band2")) & (F.col("id1") < F.col("id2"))
        )
        up = a.join(
            b, (F.col("band1") + 1 == F.col("band2")) & (F.col("id1") < F.col("id2"))
        )
        dn = a.join(
            b, (F.col("band1") == F.col("band2") + 1) & (F.col("id1") < F.col("id2"))
        )
        cos = dot(F.col("fv1"), F.col("fv2"))
        return (
            same.unionByName(up)
            .unionByName(dn)
            .filter(F.abs(F.col("len1") - F.col("len2")) <= _NF_MAXDIFF)
            .select("id1", "id2", cos.alias("cos"))
            .filter(F.col("cos") >= _NF_THRESH)
        )

    def test_near_pairs_match_raw(self, spark, patho_dir):
        from kafka_avro_order_processor_eg_4131_spark.plans.multimodal import (
            multimodal_feature_near_pairs,
        )

        cols = ("id1", "id2", "cos")
        got = _pairs(multimodal_feature_near_pairs(spark, patho_dir), cols)
        raw = _pairs(self._raw_near_pairs(spark, patho_dir), cols)
        C.release_ephemeral(spark)
        assert got == raw

    def test_raw_byte_groups_are_not_normalized_groups(self, spark, patho_dir):
        """The multimodal rep map keys on RAW bytes: the case-only (doc
        4) and whitespace-only (doc 3) variants of doc 1 share the
        dedup family's normalized fingerprint but must be their OWN
        raw-byte groups — collapsing them here would corrupt lengths,
        bands, and features."""
        from kafka_avro_order_processor_eg_4131_spark.plans.dedup import (
            _exact_rep_cached,
        )
        from kafka_avro_order_processor_eg_4131_spark.plans.multimodal import (
            _raw_rep_cached,
        )

        raw_rep = dict(_pairs(_raw_rep_cached(spark, patho_dir), ("id", "rep")))
        norm_rep = dict(_pairs(_exact_rep_cached(spark, patho_dir), ("id", "rep")))
        assert norm_rep[3] == norm_rep[4] == norm_rep[1] == 1
        assert raw_rep[1] == raw_rep[2] == 1  # byte-identical copies
        assert raw_rep[3] == 3 and raw_rep[4] == 4  # ws/case differ in bytes


class TestFixtureEdgeCoverageAssumption:
    def test_fixture_lacks_the_edge_cases(self, spark, sf_small):
        """Documents the reason this synthetic suite exists: the parquet
        fixtures contain no empty docs and no sub-shingle docs, so the
        oracle gate alone cannot exercise those expansion branches. If
        this ever fails, the fixtures gained the edge cases and the
        assertion (not the suite) can be dropped."""
        from kafka_avro_order_processor_eg_4131_spark.catalog import load
        from kafka_avro_order_processor_eg_4131_spark.functions.text import (
            norm_tokens,
        )

        d = load(spark, sf_small, "documents")
        n_edge = d.filter(
            (F.trim(F.col("text")) == "") | (F.size(norm_tokens(F.col("text"))) < 3)
        ).count()
        assert n_edge == 0
