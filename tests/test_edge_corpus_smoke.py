"""Round-7 edge-corpus crash smoke: the parquet fixtures are CLEAN
(no empty docs, no sub-shingle docs, every source carries a digit
index, pure ASCII), so ANSI-mode edge crashes hide until a foreign
corpus hits them. Two found this round by exactly this probe:
operators/dedup.py::shingles() (sequence(0, size-k) descending for
sub-k docs) and plans/sampling.py::corpus_mix_epoch_weights
(CAST('' AS INT) for digit-less sources). The slow test runs EVERY
catalog entry against the edge corpus — queries that read the missing
non-document tables skip; anything else that raises is a regression.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_avro_order_processor_eg_4131_spark.operators import cache as C

_LONG_A = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    " kilo lima mike november oscar papa quebec romeo sierra tango"
)

# sources deliberately digit-LESS (web/books/news): foreign-corpus
# naming the fixture never uses
_EDGE_DOCS = [
    (1, _LONG_A, "en", "web"),
    (2, _LONG_A, "en", "web"),
    (3, "  " + _LONG_A.replace(" ", "  ") + " ", "en", "books"),
    (4, _LONG_A.upper(), "en", "web"),
    (5, _LONG_A.rsplit(" ", 1)[0] + " zulu", "en", "web"),
    (6, "tiny doc", "en", "news"),
    (7, "", "en", "web"),
    (8, "   ", "en", "web"),
    (9, "x", "en", "web"),
    (10, "naive cafe uber resume ümläut 中文 emoji \U0001f600 end", "zz", "web"),
    (11, "the the the the the the the the", "en", "web"),
    (12, "a b", "en", "books"),
]


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_corpus")
    rows = [(i, t, lang, src, len(t)) for (i, t, lang, src) in _EDGE_DOCS]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    yield str(d)
    C.release_families(spark)


def test_mix_epoch_weights_digitless_sources(spark, edge_dir):
    """Digit-less sources must take the try_cast->NULL low band, not
    crash on ANSI CAST('' AS INT) — and stay bit-identical to the
    DuckDB oracle on the same corpus."""
    import duckdb

    from kafka_avro_order_processor_eg_4131_spark.catalog import REGISTRY

    q = REGISTRY["corpus_mix_epoch_weights"]
    got = sorted(
        (r.doc_id, r.source, r.epoch)
        for r in q.fn(spark, edge_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{edge_dir}/documents.parquet/*.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(q.oracle).fetchall())
    con.close()
    assert got == want
    # every emitted doc is in the hash-gated 0.25x band: epoch 1 only
    assert all(e == 1 for _, _, e in got)
    # and the gate keeps SOME docs (md5 first hex digit < the LO
    # fraction for at least one of 12 ids — true for this fixed corpus)
    assert 0 < len(got) < len(_EDGE_DOCS)


@pytest.mark.slow
def test_whole_catalog_survives_edge_corpus(spark, edge_dir):
    """Crash smoke over the full catalog: every query either runs
    (documents-only readers) or skips on the missing non-document
    tables; any OTHER exception is an ANSI/edge regression."""
    from kafka_avro_order_processor_eg_4131_spark.catalog import REGISTRY

    ok = skipped = 0
    crashes: list[tuple[str, str]] = []
    for name in sorted(REGISTRY):
        try:
            REGISTRY[name].fn(spark, edge_dir).count()
            ok += 1
        except Exception as e:  # noqa: BLE001 — classify, don't mask
            msg = f"{type(e).__name__}: {e}"
            if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
                skipped += 1
            else:
                crashes.append((name, msg[:200]))
        finally:
            C.release_ephemeral(spark)
    C.release_families(spark)
    assert not crashes, crashes
    assert ok >= 60, f"only {ok} queries ran — the smoke lost coverage"
