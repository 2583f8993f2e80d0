"""Round-10 PNG codec coverage (functions/png.py + the real decode
path in operators/multimodal.py): encode -> parse/decode round trips
across color types and all five scanline filters, nearest-neighbor
resample exactness, malformed-input fencing, and the Spark-side
attach_png_payload -> decode/resize kernels at fixture scale."""

from __future__ import annotations

import hashlib
import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_avro_order_processor_eg_4131_spark.functions.png import (
    PNG_SIGNATURE,
    is_png,
    nn_resize,
    png_decode,
    png_encode,
    png_parse_ihdr,
)
from kafka_avro_order_processor_eg_4131_spark.operators.multimodal import (
    PNG_H_BASE,
    PNG_H_MOD,
    PNG_PIXEL_COEF,
    PNG_W_BASE,
    PNG_W_MOD,
    png_fixture_raster,
)


class TestPngRoundTrip:
    @pytest.mark.parametrize("color_type,ch", [(0, 1), (2, 3), (4, 2), (6, 4)])
    @pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
    def test_encode_decode_round_trip(self, color_type, ch, filter_type):
        w, h = 7, 5
        raster = bytes((i * 37 + filter_type * 11 + color_type) % 256
                       for i in range(w * h * ch))
        blob = png_encode(w, h, raster, color_type=color_type,
                          filter_type=filter_type)
        assert is_png(blob)
        meta = png_parse_ihdr(blob)
        assert meta["width"] == w and meta["height"] == h
        assert meta["bit_depth"] == 8 and meta["color_type"] == color_type
        assert meta["n_channels"] == ch
        dw, dh, dch, draster = png_decode(blob)
        assert (dw, dh, dch) == (w, h, ch)
        assert draster == raster

    @settings(max_examples=30, deadline=None)
    @given(
        w=st.integers(1, 12),
        h=st.integers(1, 12),
        ft=st.integers(0, 4),
        seed=st.integers(0, 2**31),
    )
    def test_rgb_round_trip_hypothesis(self, w, h, ft, seed):
        raster = bytes((seed + i * 97) % 256 for i in range(w * h * 3))
        blob = png_encode(w, h, raster, color_type=2, filter_type=ft)
        assert png_decode(blob)[3] == raster

    def test_zlib_inflate_matches_external(self):
        """The IDAT stream of an encoded PNG inflates to the filtered
        scanlines any other decoder would see (filter byte + rows)."""
        raster = bytes(range(2 * 3 * 3))
        blob = png_encode(3, 2, raster, color_type=2, filter_type=0)
        # IDAT chunk starts after sig(8) + IHDR(25)
        (ln,) = struct.unpack(">I", blob[33:37])
        assert blob[37:41] == b"IDAT"
        raw = zlib.decompress(blob[41 : 41 + ln])
        assert raw == b"\x00" + raster[:9] + b"\x00" + raster[9:]


class TestPngFencing:
    def test_not_png(self):
        with pytest.raises(ValueError):
            png_parse_ihdr(b"plainly not a png")

    def test_bad_crc(self):
        blob = bytearray(png_encode(3, 2, bytes(18)))
        blob[30] ^= 0xFF  # corrupt the IHDR CRC
        with pytest.raises(ValueError):
            png_parse_ihdr(bytes(blob))

    def test_truncated_idat(self):
        # ValueError specifically (round-10 advice): a truncated IDAT
        # used to leak zlib.error past the kernels' except ValueError
        blob = png_encode(3, 2, bytes(18))
        with pytest.raises(ValueError):
            png_decode(blob[:40] + b"\x00" * 4)

    def test_corrupt_idat_bytes_raise_value_error(self):
        """Valid signature + IHDR but garbage IDAT payload: the inflate
        failure must surface as ValueError — the documented malformed-
        PNG contract — not zlib.error (round-10 advice)."""
        blob = bytearray(png_encode(3, 2, bytes(18)))
        # flip bytes inside the IDAT chunk payload (IHDR ends at 33;
        # IDAT payload starts at 41)
        for i in range(41, min(len(blob) - 12, 49)):
            blob[i] ^= 0xFF
        with pytest.raises(ValueError, match="IDAT inflate failed"):
            png_decode(bytes(blob))

    def test_signature_only(self):
        with pytest.raises(ValueError):
            png_parse_ihdr(PNG_SIGNATURE)


class TestNnResize:
    def test_matches_brute_force_formula(self):
        for did in [0, 1, 5, 12, 123, 4567]:
            w = did % PNG_W_MOD + PNG_W_BASE
            h = did % PNG_H_MOD + PNG_H_BASE
            raster = png_fixture_raster(did, w, h)
            small = nn_resize(raster, w, h, 3, 16, 16)
            exp = bytearray()
            for y in range(16):
                for x in range(16):
                    si, sj = y * h // 16, x * w // 16
                    for cd, ci, cj in PNG_PIXEL_COEF:
                        exp.append((did * cd + si * ci + sj * cj) % 256)
            assert small == bytes(exp), did

    def test_identity_resize(self):
        raster = bytes(range(4 * 4 * 3))
        assert nn_resize(raster, 4, 4, 3, 4, 4) == raster


class TestSparkPngPath:
    def test_attach_decode_resize_end_to_end(self, spark, sf_small):
        """Executor-side generate -> parse -> resample: dims match the
        formula, resized_sha matches a driver-side recompute."""
        from kafka_avro_order_processor_eg_4131_spark.operators import (
            multimodal as M,
        )
        from kafka_avro_order_processor_eg_4131_spark.sources.tables import (
            load_table,
        )

        docs = load_table(spark, sf_small, "documents").limit(24)
        meta = {
            r["doc_id"]: r
            for r in M.decode_image_meta(M.attach_png_payload(docs)).collect()
        }
        rs = {
            r["doc_id"]: r
            for r in M.resize_images(
                M.attach_png_payload(docs), target_w=16, target_h=16
            ).collect()
        }
        assert meta and set(meta) == set(rs)
        for did, r in meta.items():
            w = did % PNG_W_MOD + PNG_W_BASE
            h = did % PNG_H_MOD + PNG_H_BASE
            assert (r["width"], r["height"]) == (w, h)
            assert r["bit_depth"] == 8 and r["color_type"] == 2
            assert r["n_channels"] == 3
            assert r["mime"] == "image/png"
            small = nn_resize(png_fixture_raster(did, w, h), w, h, 3, 16, 16)
            assert rs[did]["resized_sha"] == hashlib.sha256(
                small.hex().encode("ascii")
            ).hexdigest()
            # resized payload is itself a valid PNG of the thumbnail
            rw, rh, rch, rraster = png_decode(bytes(rs[did]["resized_payload"]))
            assert (rw, rh, rch) == (16, 16, 3)
            assert rraster == small

    def test_non_png_payload_takes_stub_fallback(self, spark, sf_small):
        """attach_payload (utf-8 text bytes) still routes to the
        deterministic stub: sha-derived dims, unknown depth/type."""
        from kafka_avro_order_processor_eg_4131_spark.operators import (
            multimodal as M,
        )
        from kafka_avro_order_processor_eg_4131_spark.sources.tables import (
            load_table,
        )

        docs = load_table(spark, sf_small, "documents").limit(5)
        rows = M.decode_image_meta(M.attach_payload(docs)).collect()
        assert rows
        for r in rows:
            digest = r["sha256"]
            assert r["width"] == int(digest[:4], 16) % 1920 + 1
            assert r["height"] == int(digest[4:8], 16) % 1080 + 1
            assert r["bit_depth"] == -1 and r["color_type"] == -1

    def test_corrupt_idat_payload_takes_malformed_fallback(self, spark):
        """A PNG with valid signature/IHDR but corrupt IDAT must take
        the documented malformed fallback in BOTH kernels — resize ->
        (b'', ''), decode-meta -> -1 dims — instead of crashing the
        executor task with zlib.error (round-10 advice)."""
        from kafka_avro_order_processor_eg_4131_spark.operators import (
            multimodal as M,
        )

        blob = bytearray(png_encode(3, 2, bytes(18)))
        for i in range(41, min(len(blob) - 12, 49)):
            blob[i] ^= 0xFF
        df = spark.createDataFrame(
            [(1, bytes(blob), "image/png", len(blob))],
            "doc_id long, payload binary, mime string, n_bytes long",
        )
        r = M.resize_images(df, target_w=4, target_h=4).collect()[0]
        assert bytes(r["resized_payload"]) == b""
        assert r["resized_sha"] == ""
        m = M.decode_image_meta(df).collect()[0]
        # IHDR itself is intact, so metadata decode still succeeds —
        # the inflate is not on the metadata path
        assert (m["width"], m["height"]) == (3, 2)

    def test_negative_doc_id_fails_loudly(self, spark):
        """attach_png_payload's formula domain is doc_id >= 0 (Python %
        vs SQL % diverge below zero, and did % 5 would hand png_encode
        a negative filter type): a negative id must raise, not emit a
        silently-diverging payload (round-10 advice)."""
        from kafka_avro_order_processor_eg_4131_spark.operators import (
            multimodal as M,
        )

        docs = spark.createDataFrame([(-3,)], "doc_id long")
        # surfaces as PythonException from the worker; match the message
        with pytest.raises(Exception, match="negative doc_id"):
            M.attach_png_payload(docs).collect()
