"""Round-10 pins: cross-engine parity details added this round.

- Padded-numeric JSON extraction (round-9 advice): the scalar_json_funcs
  oracle regex was widened to admit whitespace-padded integral strings,
  because BOTH engines' casts trim whitespace — Spark's string->int cast
  (UTF8String.trimAll) and DuckDB's TRY_CAST. This pins the agreement on
  the exact padded forms the regex now admits.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

# padded/edge numeric strings that the $.k extraction path can see
_PADDED_CASES = [
    " 7",
    "\t-3 ",
    "+7",
    "  +0042\t",
    "7",
    "-3",
    " 2.9",      # non-integral: NULL both sides (regex rejects; Spark NULL)
    "",          # empty: NULL both sides
    " ",         # whitespace-only: NULL both sides
    "99999999999999999999",  # overflow: NULL both sides
    "half 7",    # interior text: NULL both sides
    # round-11 (advice): control-char padding — Spark's trimAll strips
    # ALL ASCII <= 0x20, RE2's \s is only [\t\n\f\r ], and DuckDB's own
    # TRY_CAST trim set accepts \x0b/\x0c but NULLs \x00/\x1f padding,
    # which is why the oracle strips the padding before casting
    "\x0b7",     # VT: Spark parses 7; old \s guard NULLed it
    "\x1f7",     # unit sep: Spark parses 7; DuckDB TRY_CAST alone NULLs
    "\x007",     # NUL pad: Spark parses 7; DuckDB TRY_CAST alone NULLs
    "7\x0c",     # trailing FF
    "\x0e 7 \x01",  # mixed control+space padding both ends
    # round-12 (advice): \x7f (DEL) — Spark's trimAll strips whitespace
    # OR Character.isISOControl bytes, and DEL (0x7f) is ISO control but
    # NOT <= 0x20; the round-11 [\x00-\x20] class missed it (C1
    # \x85-\x9f are multi-byte in UTF-8 and correctly NULL both sides)
    "\x7f7",        # DEL pad: Spark parses 7
    " \x7f 7",      # mixed DEL+space padding
    "7\x7f",        # trailing DEL
]

# the exact guarded-cast pair scalar_json_funcs' oracle runs (round-12:
# [\x00-\x20\x7f] class + explicit strip before the cast — see the
# plan's docstring for why the strip is required and why \x7f is in)
_ORACLE_REGEX = r"^[\x00-\x20\x7f]*[+-]?[0-9]+[\x00-\x20\x7f]*$"
_ORACLE_STRIP = r"^[\x00-\x20\x7f]+|[\x00-\x20\x7f]+$"


class TestPaddedNumericCast:
    def test_spark_try_cast_matches_guarded_duckdb_try_cast(self, spark):
        """For every case: Spark try_cast(string -> int) must equal the
        oracle's regex-guarded strip-then-TRY_CAST — the exact pair of
        expressions scalar_json_funcs runs on the two sides."""
        df = spark.createDataFrame(
            [(i, s) for i, s in enumerate(_PADDED_CASES)], "i int, s string"
        )
        got = {
            r["i"]: r["k"]
            for r in df.select(
                "i", F.col("s").try_cast("int").alias("k")
            ).collect()
        }
        for i, s in enumerate(_PADDED_CASES):
            (ok, duck) = duckdb.execute(
                "SELECT regexp_matches(?, ?),"
                " TRY_CAST(regexp_replace(?, ?, '', 'g') AS INT)",
                [s, _ORACLE_REGEX, s, _ORACLE_STRIP],
            ).fetchone()
            expect = duck if ok else None
            assert got[i] == expect, (
                f"case {s!r}: spark={got[i]!r} oracle={expect!r}"
            )

    def test_padded_integral_parses_in_spark(self, spark):
        """The motivating divergence: ' 7' parses in Spark (the old
        integral-only oracle regex NULLed it)."""
        row = spark.sql("SELECT try_cast(' 7' AS int) AS k").collect()[0]
        assert row["k"] == 7


class TestVembIdempotent:
    def test_composed_oracle_has_single_style_vemb_defs(self):
        """_vemb leaves already-wrapped composed oracles unchanged: no
        self-referential 'vemb AS (SELECT * FROM vemb' text survives in
        any registered oracle (round-9 advice)."""
        from kafka_avro_order_processor_eg_4131_spark.catalog import REGISTRY
        # import for side effect: registers all plans
        import kafka_avro_order_processor_eg_4131_spark.api  # noqa: F401

        for name, ent in REGISTRY.items():
            if ent.oracle is None:
                continue
            assert "vemb AS (SELECT * FROM vemb" not in ent.oracle, (
                f"{name}: self-referential vemb CTE"
            )

    def test_vemb_skips_wrapped_body(self):
        from kafka_avro_order_processor_eg_4131_spark.plans.similarity import (
            _vemb,
        )

        wrapped = _vemb("SELECT * FROM embeddings")
        assert wrapped.count("vemb AS (") == 1
        # second application is the identity
        assert _vemb(wrapped) == wrapped

    def test_vemb_raises_on_unfenced_direct_scan(self):
        """ValueError, not assert (round-10 advice): the fence must
        survive `python -O`, which compiles asserts out."""
        from kafka_avro_order_processor_eg_4131_spark.plans.similarity import (
            _vemb,
        )

        wrapped = _vemb("SELECT * FROM embeddings")
        hostile = f"WITH inner1 AS ({wrapped}) SELECT * FROM embeddings"
        with pytest.raises(ValueError, match="outside a vemb CTE"):
            _vemb(hostile)
