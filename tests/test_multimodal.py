"""Audio/video multimodal tests: real WAV (PCM + G.711 + IMA ADPCM,
cross-validated against stdlib wave/audioop) and AVI/MJPEG codecs,
legacy stand-in containers, and the Spark-side contract."""

import numpy as np
import pytest

from pythongis_spark.images import multimodal as MM


def test_audio_roundtrip_deterministic():
    a = MM.make_audio_clip(7)
    b = MM.make_audio_clip(7)
    assert a["bytes"] == b["bytes"]
    pcm = MM.decode_audio(a["bytes"])
    assert len(pcm) == a["n_samples"]
    assert np.abs(pcm).max() > 10000  # sine at 0.6 amplitude


def test_audio_features_spark(spark):
    df = MM.audio_df(spark, 12, partitions=3)
    f = MM.audio_features(df).toPandas()
    assert len(f) == 12
    assert ((0.3 < f["rms"]) & (f["rms"] < 0.6)).all()
    assert (f["duration_s"] == 0.5).all()


def test_video_roundtrip_and_sampling(spark):
    v = MM.make_video(3)
    vid = MM.decode_video(v["bytes"])
    assert vid.shape == (8, 24, 32, 3)  # real AVI/MJPEG decodes to RGB
    df = MM.video_df(spark, 5)
    frames = MM.sample_frames(df, every=2).toPandas()
    assert len(frames) == 5 * 4  # 8 frames, every 2nd
    assert frames["frame"].max() == 6


def test_external_decode_stub():
    with pytest.raises(NotImplementedError, match="audio library"):
        MM.decode_audio_external("mp3")
    with pytest.raises(ValueError):
        MM.decode_audio(b"XXXX1234")


# ------------------------------------------------------------ real WAV

def test_wav_roundtrip_and_stdlib_cross_validation(tmp_path):
    """Our RIFF writer/reader against the stdlib `wave` module in BOTH
    directions (foreign-implementation oracle, same pattern as the
    libjpeg bitstream tests)."""
    import io
    import wave as stdwave

    import numpy as np

    rng = np.random.Generator(np.random.PCG64(5))
    pcm = rng.integers(-32768, 32768, size=4001, dtype=np.int16)  # odd length -> pad byte

    # ours -> stdlib
    blob = MM.encode_wav(pcm, 8000, 1)
    with stdwave.open(io.BytesIO(blob)) as w:
        assert (w.getnchannels(), w.getsampwidth(), w.getframerate()) == (1, 2, 8000)
        assert w.getnframes() == 4001
        back = np.frombuffer(w.readframes(4001), dtype="<i2")
    assert (back == pcm).all()

    # stdlib -> ours
    buf = io.BytesIO()
    with stdwave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(44100)
        stereo = rng.integers(-32768, 32768, size=2000, dtype=np.int16)
        w.writeframes(stereo.tobytes())
    got, sr, ch = MM.decode_wav(buf.getvalue())
    assert (sr, ch) == (44100, 2)
    assert (got == stereo).all()


def test_wav_chunk_walk_and_errors():
    import struct

    import numpy as np

    pcm = np.arange(-50, 50, dtype=np.int16)
    blob = MM.encode_wav(pcm, 16000, 1)
    # splice a LIST chunk between fmt and data: decoder must skip it
    fmt_end = blob.index(b"data")
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd size + pad
    spliced = blob[:fmt_end] + extra + blob[fmt_end:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    got, sr, ch = MM.decode_wav(spliced)
    assert (got == pcm).all() and sr == 16000

    with pytest.raises(ValueError):
        MM.decode_wav(b"RIFX" + blob[4:])
    # float WAV (format tag 3) must raise, not mis-decode
    tag3 = blob.replace(b"fmt " + struct.pack("<IH", 16, 1),
                        b"fmt " + struct.pack("<IH", 16, 3))
    with pytest.raises(NotImplementedError):
        MM.decode_wav(tag3)


def test_audio_clip_wav_default_and_faud_parity():
    """Default clips are real WAV; the same index encodes the same PCM in
    both containers, so the decoded signal (and thus every feature) is
    identical."""
    w = MM.make_audio_clip(9)
    assert w["fmt"] == "wav" and bytes(w["bytes"][:4]) == b"RIFF"
    f = MM.make_audio_clip(9, fmt="faud")
    import numpy as np

    assert (MM.decode_audio(w["bytes"]) == MM.decode_audio(f["bytes"])).all()


# ------------------------------------------------------------ real AVI/MJPEG

def test_avi_mjpeg_roundtrip_and_structure():
    import struct

    import numpy as np

    v = MM.make_video(3)
    assert v["fmt"] == "avi"
    blob = bytes(v["bytes"])
    assert blob[:4] == b"RIFF" and blob[8:12] == b"AVI "
    frames, fps = MM.decode_avi_mjpeg(blob)
    assert frames.shape == (8, 24, 32, 3) and fps == 8.0
    # MJPEG at q=92 stays close to the raw gradient planes
    raw = MM.decode_video(MM.make_video(3, fmt="fvid")["bytes"])
    assert np.abs(frames[..., 0].astype(int) - raw.astype(int)).max() <= 4

    # idx1 offsets must point at the movi '00dc' chunks (movi-relative)
    movi_pos = blob.index(b"movi")
    idx_pos = blob.index(b"idx1")
    n_idx = struct.unpack_from("<I", blob, idx_pos + 4)[0] // 16
    assert n_idx == 8
    for k in range(n_idx):
        ckid, flags, off, size = struct.unpack_from("<4sIII", blob, idx_pos + 8 + 16 * k)
        assert ckid == b"00dc" and flags == 0x10
        at = movi_pos + off
        assert blob[at : at + 4] == b"00dc"
        assert struct.unpack_from("<I", blob, at + 4)[0] == size


def test_avi_decode_errors_and_fvid_dispatch():
    import numpy as np

    with pytest.raises(ValueError):
        MM.decode_video(b"XXXX0000")
    with pytest.raises(ValueError):
        MM.decode_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")
    legacy = MM.make_video(1, fmt="fvid")
    assert MM.decode_video(legacy["bytes"]).shape == (8, 24, 32)


def test_video_sampling_over_avi_spark(spark):
    df = MM.video_df(spark, 4)
    frames = MM.sample_frames(df, every=2).toPandas()
    assert len(frames) == 4 * 4
    assert set(frames["frame"]) == {0, 2, 4, 6}
    assert ((0 < frames["mean"]) & (frames["mean"] < 255)).all()


def _wav_container(tag, ch, sr, block_align, bits, payload, n_samples=None):
    """Assemble a minimal WAV with an arbitrary fmt tag (test helper)."""
    import struct

    fmt = struct.pack("<HHIIHH", tag, ch, sr, sr * max(block_align, 1),
                      block_align, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if n_samples is not None:
        body += b"fact" + struct.pack("<II", 4, n_samples)
    body += b"data" + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_wav_g711_decode_vs_audioop():
    """G.711 µ-law / A-law expansion matches the stdlib audioop foreign
    implementation byte-for-byte over every possible code byte."""
    import audioop

    import numpy as np

    codes = bytes(range(256)) * 4
    want_u = np.frombuffer(audioop.ulaw2lin(codes, 2), dtype="<i2")
    pcm, sr, ch = MM.decode_wav(_wav_container(7, 1, 8000, 1, 8, codes))
    assert sr == 8000 and ch == 1
    assert (pcm == want_u).all()

    want_a = np.frombuffer(audioop.alaw2lin(codes, 2), dtype="<i2")
    pcm, _, _ = MM.decode_wav(_wav_container(6, 1, 8000, 1, 8, codes))
    assert (pcm == want_a).all()


def test_wav_pcm8_and_float32_decode():
    import numpy as np

    u8 = np.arange(256, dtype=np.uint8).tobytes()
    pcm, _, _ = MM.decode_wav(_wav_container(1, 1, 8000, 1, 8, u8))
    assert pcm[128] == 0 and pcm[0] == -32768 and pcm[255] == 127 * 256

    f = (np.linspace(-1, 1, 101).astype("<f4")).tobytes()
    pcm, _, _ = MM.decode_wav(_wav_container(3, 1, 8000, 4, 32, f))
    assert pcm[0] == -32767 and pcm[50] == 0 and pcm[-1] == 32767


def test_wav_ima_adpcm_decode_vs_audioop():
    """Mono IMA ADPCM blocks decode to the same samples as audioop's
    Intel/DVI ADPCM engine seeded with each block's header state (WAV
    packs the low nibble first; audioop packs high-first, so the test
    swaps nibbles before handing audioop the same delta stream)."""
    import audioop
    import struct

    import numpy as np

    rng = np.random.RandomState(11)
    block_align = 36  # 4-byte header + 32 payload bytes = 65 samples
    n_blocks = 7
    blocks = []
    want = []
    for b in range(n_blocks):
        pred = int(rng.randint(-32768, 32767))
        idx = int(rng.randint(0, 89))
        payload = rng.randint(0, 256, size=block_align - 4, dtype=np.uint8)
        blocks.append(struct.pack("<hBB", pred, idx, 0) + payload.tobytes())
        swapped = ((payload & 0x0F) << 4 | (payload >> 4)).astype(np.uint8)
        dec, _state = audioop.adpcm2lin(swapped.tobytes(), 2, (pred, idx))
        want.append(np.array([pred], dtype=np.int16))
        want.append(np.frombuffer(dec, dtype="<i2"))
    payload = b"".join(blocks)
    n_total = n_blocks * (1 + (block_align - 4) * 2)
    blob = _wav_container(0x11, 1, 8000, block_align, 4, payload,
                          n_samples=n_total)
    pcm, sr, ch = MM.decode_wav(blob)
    assert (pcm == np.concatenate(want)).all()


def test_wav_ima_adpcm_partial_block_and_errors():
    import struct

    import numpy as np

    # trailing partial block trimmed via the fact chunk
    block_align = 12
    full = struct.pack("<hBB", 100, 0, 0) + bytes(range(8))
    partial = struct.pack("<hBB", -5, 3, 0) + bytes([0x11, 0x22])
    n_total = (1 + 16) + (1 + 4)
    blob = _wav_container(0x11, 1, 8000, block_align, 4, full + partial,
                          n_samples=n_total)
    pcm, _, _ = MM.decode_wav(blob)
    assert pcm.size == n_total and pcm[0] == 100 and pcm[17] == -5

    import pytest

    with pytest.raises(NotImplementedError, match="multi-channel"):
        MM.decode_wav(_wav_container(0x11, 2, 8000, 36, 4, full))
    with pytest.raises(NotImplementedError, match="not supported"):
        MM.decode_wav(_wav_container(85, 1, 8000, 1, 16, b"\x00\x00"))


def test_audio_fingerprint_neardup_planted(spark):
    """Planted byte-exact duplicates are the only pairs within radius 3
    through decode → envelope fingerprint → banded join."""
    clips = MM.noise_audio_df(spark, 40, dup_every=10)
    assert clips.count() == 44
    got = {
        (r.a_id, r.b_id, r.hamming)
        for r in MM.audio_neardup_pairs(clips, max_hamming=3).collect()
    }
    assert got == {(f"dc{i:09d}", f"nc{i:09d}", 0) for i in range(0, 40, 10)}


def test_audio_fingerprint_brute_parity(spark):
    """Banded join == O(n²) Hamming over the actual fingerprints at a
    radius large enough to admit non-planted pairs (n_bands raised so
    the pigeonhole guarantee still holds)."""
    import numpy as np

    clips = MM.noise_audio_df(spark, 30)
    sigs = [(r.clip_id, r.afp) for r in MM.audio_fingerprints(clips).collect()]
    from pythongis_spark.operators.dedup import hamming_neardup_pairs

    radius = 28
    expect = set()
    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            d = bin((sigs[i][1] ^ sigs[j][1]) & ((1 << 64) - 1)).count("1")
            if d <= radius:
                a, b = sorted((sigs[i][0], sigs[j][0]))
                expect.add((a, b, d))
    assert expect  # white-noise fingerprints sit near Hamming ~32
    got = {
        (r.a_id, r.b_id, r.hamming)
        for r in hamming_neardup_pairs(
            MM.audio_fingerprints(clips), "clip_id", "afp",
            max_hamming=radius, n_bands=32, bucket_cap=None,
        ).collect()
    }
    assert got == expect


def test_video_fingerprint_neardup_planted(spark):
    vids = MM.noise_video_df(spark, 30, dup_every=10)
    assert vids.count() == 33
    got = {
        (r.a_id, r.b_id, r.hamming)
        for r in MM.video_neardup_pairs(vids, max_hamming=3).collect()
    }
    assert got == {(f"dv{i:09d}", f"nv{i:09d}", 0) for i in range(0, 30, 10)}


def test_video_fingerprint_frame_order_invariant():
    """Majority vote is frame-order invariant and survives dropping a
    minority of frames at small distance."""
    import numpy as np

    from pythongis_spark.images import codec

    frames = np.stack(
        [codec.make_noise_pixels(5000 + f, 32, 24) for f in range(8)]
    )
    h1 = MM.video_fingerprint(frames)
    h2 = MM.video_fingerprint(frames[::-1])
    assert h1 == h2
    h3 = MM.video_fingerprint(frames[:6])  # drop 2 of 8 frames
    d = bin((h1 ^ h3) & ((1 << 64) - 1)).count("1")
    assert d <= 16, d


def test_lcg_audio_clip_matches_closed_form():
    """The SQL-replayable clip really follows the documented recurrence
    after a full WAV encode->decode round trip."""
    import numpy as np

    from pythongis_spark.images.multimodal import decode_audio, make_lcg_audio_clip

    clip = make_lcg_audio_clip(7)
    pcm = decode_audio(clip["bytes"]).astype(np.int64)
    t = np.arange(4000, dtype=np.int64)
    expect = (7 * 48271 + t * 40503) % 65536 - 32768
    assert np.array_equal(pcm, expect)


def test_lcg_pixels_match_closed_form_after_png():
    import numpy as np

    from pythongis_spark.images import codec

    px = codec.make_lcg_pixels(7, 64, 48)
    out = codec.decode_image(codec.encode_png(px))
    assert np.array_equal(out, px)
    p = np.arange(64 * 48 * 3, dtype=np.int64)
    expect = ((7 * 48271 + p * 104729) % 256).astype(np.uint8).reshape(48, 64, 3)
    assert np.array_equal(px, expect)


def test_avi_raw_round_trip_exact():
    """Uncompressed BI_RGB AVI is lossless for any frame content,
    including widths that force DIB row padding."""
    import numpy as np

    from pythongis_spark.images.multimodal import decode_avi_mjpeg, encode_avi_raw

    rng = np.random.default_rng(11)
    for w, h in [(32, 24), (33, 17), (1, 1)]:
        frames = rng.integers(0, 256, size=(3, h, w, 3), dtype=np.uint8)
        out, fps = decode_avi_mjpeg(encode_avi_raw(frames, 8.0))
        assert out.shape == frames.shape and np.array_equal(out, frames)
        assert fps == 8.0


def test_avi_raw_top_down_dib():
    """Negative biHeight marks a top-down DIB: rows are already in
    raster order and the decoder must NOT apply the bottom-up flip."""
    import struct

    import numpy as np

    from pythongis_spark.images.multimodal import decode_avi_mjpeg, encode_avi_raw

    rng = np.random.default_rng(12)
    h, w = 17, 33  # odd width forces row padding too
    frames = rng.integers(0, 256, size=(2, h, w, 3), dtype=np.uint8)
    # encoding the vertically-flipped frames bottom-up yields payload
    # rows in raster order of `frames` — i.e. a top-down DIB payload
    blob = encode_avi_raw(frames[:, ::-1], 8.0)
    i = blob.find(b"strf")
    h_off = i + 8 + 8  # strf body + biSize(4) + biWidth(4)
    assert struct.unpack_from("<i", blob, h_off)[0] == h
    blob = blob[:h_off] + struct.pack("<i", -h) + blob[h_off + 4:]
    out, _fps = decode_avi_mjpeg(blob)
    assert np.array_equal(out, frames)


def test_lcg_video_matches_closed_form():
    import numpy as np

    from pythongis_spark.images.multimodal import decode_video, make_lcg_video

    vid = make_lcg_video(7)
    v = decode_video(vid["bytes"]).astype(np.int64).ravel()
    q = np.arange(v.size, dtype=np.int64)
    assert np.array_equal(v, (7 * 48271 + q * 104729) % 256)
