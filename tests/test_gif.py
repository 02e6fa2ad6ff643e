"""GIF codec (GIF87a/89a, public spec): hand-assembled spec fixture +
round trips incl. interlace, width growth, and table reset."""

import numpy as np
import pytest

from pythongis_spark.images import codec
from pythongis_spark.images import gif as GIF


def test_hand_assembled_minimal_gif():
    """The canonical 43-byte 1x1 GIF (assembled byte-by-byte from the
    spec, not produced by our encoder): header, LSD with 2-entry GCT,
    graphic control extension (skipped), image descriptor, 2-bit LZW
    stream 0x44 0x01 = Clear, index 0, EOI."""
    blob = bytes.fromhex(
        "474946383961"          # GIF89a
        "010001008000"          # LSD: 1x1, GCT flag, 2 colors, bg 0
        "00"                    # aspect
        "000000ffffff"          # GCT: black, white
        "21f90401000000" "00"   # GCE extension (skipped by decoder)
        "2c0000000001000100" "00"  # image descriptor, no LCT
        "02"                    # LZW min code size
        "024401"                # one 2-byte sub-block
        "003b"                  # terminator + trailer
    )
    px = GIF.decode_gif(blob)
    assert px.shape == (1, 1, 3)
    assert (px == [[[0, 0, 0]]]).all()
    assert (codec.decode_image(blob) == px).all()


def test_gif_roundtrip_plain_and_interlaced():
    rng = np.random.Generator(np.random.PCG64(11))
    pal = rng.integers(0, 256, size=(200, 3), dtype=np.uint8)
    px = pal[rng.integers(0, 200, size=(37, 53))]
    for interlace in (False, True):
        blob = GIF.encode_gif(px, interlace=interlace)
        assert blob[:6] == b"GIF89a"
        assert (GIF.decode_gif(blob) == px).all()
    assert (codec.decode_image(GIF.encode_gif(px)) == px).all()


def test_gif_bilevel_and_table_reset():
    tiny = np.array(
        [[[0, 0, 0], [255, 255, 255]], [[255, 255, 255], [0, 0, 0]]],
        dtype=np.uint8,
    )
    assert (GIF.decode_gif(GIF.encode_gif(tiny)) == tiny).all()
    # 120k pixels of 200-color noise drives the LZW table past 4096
    # entries -> encoder Clear/reset path
    rng = np.random.Generator(np.random.PCG64(7))
    pal = rng.integers(0, 256, size=(200, 3), dtype=np.uint8)
    big = pal[rng.integers(0, 200, size=(300, 400))]
    assert (GIF.decode_gif(GIF.encode_gif(big)) == big).all()


def test_gif_lzw_pair_widths():
    rng = np.random.default_rng(0)
    for n, bits in [(50, 2), (1000, 4), (8000, 8), (30000, 8)]:
        data = bytes(rng.integers(0, 1 << bits, n, dtype=np.uint8))
        mcs = max(2, bits)
        assert GIF._lzw_decode_gif(GIF._lzw_encode_gif(data, mcs), mcs) == data


def test_gif_errors():
    with pytest.raises(ValueError):
        GIF.decode_gif(b"NOTAGIF" + b"\x00" * 20)
    rng = np.random.Generator(np.random.PCG64(3))
    rich = rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
    if len(np.unique(rich.reshape(-1, 3), axis=0)) > 256:
        with pytest.raises(ValueError, match="256 colors"):
            GIF.encode_gif(rich)
