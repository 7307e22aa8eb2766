"""operators/png_codec.py (VERDICT r17 item 7): the vendored
pure-stdlib PNG codec that makes the multimodal real decode/resize leg
executable in the codec-less sandbox — encode/decode round trips for
every supported channel count, all five scanline filters against a
reference filterer, nearest-neighbor resample pixel pins, and the
Spark resize leg end-to-end on REAL pixels."""

from __future__ import annotations

import random
import struct
import zlib

import pytest

from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.png_codec import (
    _paeth,
    decode_png,
    encode_png,
    resize_nearest,
)


def _pixels(w, h, ch, seed=7):
    rng = random.Random(seed)
    return bytes(rng.randrange(256) for _ in range(w * h * ch))


class TestRoundTrip:
    @pytest.mark.parametrize("channels", [1, 2, 3, 4])
    def test_encode_decode_identity(self, channels):
        w, h = 9, 5
        px = _pixels(w, h, channels)
        assert decode_png(encode_png(w, h, channels, px)) == (w, h, channels, px)

    def test_one_pixel(self):
        assert decode_png(encode_png(1, 1, 3, b"\x01\x02\x03")) == (
            1, 1, 3, b"\x01\x02\x03",
        )

    def test_size_mismatch_raises(self):
        with pytest.raises(ValueError):
            encode_png(2, 2, 3, b"\x00" * 11)


def _filtered_png(w, h, ch, px, filter_types):
    """Reference implementation: build a PNG whose row y uses
    filter_types[y], filtering the known pixels with the spec's
    FORWARD transform — decode must invert it exactly."""
    stride = w * ch
    raw = bytearray()
    for y in range(h):
        ft = filter_types[y]
        raw.append(ft)
        for x in range(stride):
            cur = px[y * stride + x]
            left = px[y * stride + x - ch] if x >= ch else 0
            up = px[(y - 1) * stride + x] if y > 0 else 0
            ul = px[(y - 1) * stride + x - ch] if (y > 0 and x >= ch) else 0
            if ft == 0:
                v = cur
            elif ft == 1:
                v = (cur - left) & 0xFF
            elif ft == 2:
                v = (cur - up) & 0xFF
            elif ft == 3:
                v = (cur - ((left + up) >> 1)) & 0xFF
            else:
                v = (cur - _paeth(left, up, ul)) & 0xFF
            raw.append(v)

    def chunk(ctype, payload):
        return (
            struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


class TestFilters:
    @pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
    def test_single_filter_type(self, ft):
        w, h, ch = 7, 4, 3
        px = _pixels(w, h, ch, seed=ft)
        data = _filtered_png(w, h, ch, px, [ft] * h)
        assert decode_png(data) == (w, h, ch, px)

    def test_mixed_filters(self):
        w, h, ch = 6, 5, 4
        px = _pixels(w, h, ch, seed=99)
        data = _filtered_png(w, h, ch, px, [4, 3, 1, 2, 0])
        assert decode_png(data) == (w, h, ch, px)


class TestRejections:
    def test_bad_signature(self):
        with pytest.raises(ValueError):
            decode_png(b"NOTAPNG" + b"\x00" * 30)

    def test_bad_crc(self):
        data = bytearray(encode_png(2, 2, 3, _pixels(2, 2, 3)))
        data[-5] ^= 0xFF  # corrupt IEND CRC
        with pytest.raises(ValueError):
            decode_png(bytes(data))

    def test_palette_rejected(self):
        def chunk(ctype, payload):
            return (
                struct.pack(">I", len(payload)) + ctype + payload
                + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
            )

        data = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        )
        with pytest.raises(ValueError):
            decode_png(data)


class TestResize:
    def test_no_op_within_bounds(self):
        px = _pixels(4, 3, 3)
        assert resize_nearest(4, 3, 3, px, 8) == (4, 3, px)

    def test_exact_halving_picks_center_samples(self):
        # 4x2 grey image -> max_side 2 gives 2x1; center-sample rule
        # picks columns floor((x+0.5)*4/2) = 1, 3 of row
        # floor((0+0.5)*2/1) = 1
        px = bytes([0, 1, 2, 3,
                    10, 11, 12, 13])
        assert resize_nearest(4, 2, 1, px, 2) == (2, 1, bytes([11, 13]))

    def test_resize_never_exceeds_max_side(self):
        for w, h in [(100, 7), (7, 100), (33, 33)]:
            nw, nh, _ = resize_nearest(w, h, 1, _pixels(w, h, 1), 16)
            assert max(nw, nh) <= 16 and min(nw, nh) >= 1


class TestSparkResizeRealLeg:
    def test_resize_assets_real_png_path(self, spark):
        """The real pixel leg end-to-end with NO PIL: a 8x4 RGB PNG
        through resize_assets(max_side=4) must come back as a VALID
        PNG whose pixels equal the reference nearest-neighbor
        resample — not the stub's byte truncation."""
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.multimodal import (
            resize_assets,
        )

        w, h, ch = 8, 4, 3
        px = _pixels(w, h, ch, seed=5)
        png = encode_png(w, h, ch, px)
        assets = spark.createDataFrame(
            [(1, "image", png, "image/png"), (2, "image", b"not an image", None)],
            "asset_id long, modality string, content binary, mime string",
        )
        rows = {r["asset_id"]: r for r in resize_assets(assets, max_side=4).collect()}
        real = rows[1]
        assert (real["width"], real["height"]) == (4, 2)
        got = decode_png(bytes(real["content"]))
        assert got == (4, 2, ch, resize_nearest(w, h, ch, px, 4)[2])
        # the non-image payload still takes the deterministic stub
        assert rows[2]["width"] >= 1 and rows[2]["height"] >= 1

    def test_real_codec_strict_raises_on_undecodable(self, spark):
        from intelligent_fraud_detection_system_using_machine_learning_and_hadoop_spark.operators.multimodal import (
            _have_pil,
            resize_assets,
        )

        if _have_pil():
            pytest.skip("PIL present — strict mode exercised via PIL")
        assets = spark.createDataFrame(
            [(1, "image", b"definitely not an image", None)],
            "asset_id long, modality string, content binary, mime string",
        )
        from py4j.protocol import Py4JJavaError

        with pytest.raises(Exception) as ei:
            resize_assets(assets, real_codec=True).collect()
        assert "not decodable" in str(ei.value) or isinstance(
            ei.value, Py4JJavaError
        )


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        w=st.integers(1, 24),
        h=st.integers(1, 12),
        ch=st.sampled_from([1, 2, 3, 4]),
        data=st.data(),
    )
    def test_roundtrip_property(w, h, ch, data):
        """encode ∘ decode = identity for every supported shape, any
        pixel content (hypothesis; complements the fixed fixtures)."""
        px = bytes(
            data.draw(
                st.lists(
                    st.integers(0, 255),
                    min_size=w * h * ch,
                    max_size=w * h * ch,
                )
            )
        )
        assert decode_png(encode_png(w, h, ch, px)) == (w, h, ch, px)

    @settings(max_examples=30, deadline=None)
    @given(
        w=st.integers(1, 40),
        h=st.integers(1, 40),
        max_side=st.integers(1, 48),
    )
    def test_resize_geometry_property(w, h, max_side):
        """Resize never exceeds max_side, never collapses below 1 px,
        and is a no-op exactly when already within bounds."""
        px = bytes((i * 37) % 256 for i in range(w * h))
        nw, nh, out = resize_nearest(w, h, 1, px, max_side)
        assert 1 <= nw and 1 <= nh and max(nw, nh) <= max(max_side, 1)
        if max(w, h) <= max_side:
            assert (nw, nh, out) == (w, h, px)
        assert len(out) == nw * nh

except ImportError:  # pragma: no cover - hypothesis is baked in here
    pass
