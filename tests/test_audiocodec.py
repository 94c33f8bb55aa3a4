"""PCM WAV codec + audio features (operators/audiocodec.py).

Also under the full DuckDB value oracle via the audio_features entry;
these tests pin the container parse, the feature arithmetic, and the
honest compressed-format boundary.
"""
import numpy as np
import pytest

from tests.conftest import spark  # noqa: F401


def test_wav_roundtrip_exact():
    from nacc_form_validator_spark.operators.audiocodec import (
        decode_wav, encode_wav)
    rng = np.random.RandomState(3)
    s = rng.randint(-32768, 32768, 257).astype("<i2")
    rate, ch, out = decode_wav(encode_wav(s, 16000))
    assert rate == 16000 and ch == 1
    assert np.array_equal(out, s)


def test_wav_chunk_walk_skips_unknown_chunks():
    """Real encoders put LIST/INFO chunks before data; the walker must
    skip them (word-aligned) and still find fmt + data."""
    import struct

    from nacc_form_validator_spark.operators.audiocodec import (
        decode_wav, encode_wav)
    s = np.array([1, -2, 3], dtype="<i2")
    w = encode_wav(s, 8000)
    # splice an odd-sized junk chunk between WAVE and fmt
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = w[:12] + junk + w[12:]
    spliced = (b"RIFF" + struct.pack("<I", len(spliced) - 8) +
               spliced[8:])
    rate, _, out = decode_wav(spliced)
    assert rate == 8000 and np.array_equal(out, s)


def test_wav_rejects_non_pcm_and_garbage():
    import struct

    from nacc_form_validator_spark.operators.audiocodec import (
        AudioDecodeError, decode_wav, encode_wav)
    with pytest.raises(AudioDecodeError):
        decode_wav(b"ID3\x03whatever mp3 bytes")
    w = bytearray(encode_wav(np.array([0], dtype="<i2")))
    w[20:22] = struct.pack("<H", 85)      # fmt tag 85 = MP3
    with pytest.raises(AudioDecodeError, match="external codecs"):
        decode_wav(bytes(w))


def test_audio_features_hand_values():
    from nacc_form_validator_spark.operators.audiocodec import (
        audio_features)
    # square wave: +100, -100 alternating, 8 samples at 1 kHz
    s = np.array([100, -100] * 4, dtype="<i2")
    f = audio_features(1000, s)
    assert f["n_samples"] == 8 and f["duration_s"] == 0.008
    assert f["rms"] == 100.0 and f["peak"] == 100
    assert f["zcr"] == 1.0                # crosses at every step
    flat = audio_features(1000, np.array([5, 5, 5], dtype="<i2"))
    assert flat["zcr"] == 0.0
    assert audio_features(1000, np.array([], dtype="<i2"))["rms"] == 0.0


def test_decode_audio_batch_matches_duckdb(spark):
    import duckdb

    from nacc_form_validator_spark.operators.audiocodec import (
        audio_features_sql, decode_audio_batch, deterministic_wav_clips)
    docs = spark.createDataFrame([(i,) for i in range(10)],
                                 "doc_id long")
    got = [tuple(r) for r in
           decode_audio_batch(deterministic_wav_clips(docs))
           .orderBy("url").collect()]
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS "
                "SELECT range AS doc_id FROM range(10)")
    want = con.execute(audio_features_sql()).fetchall()
    assert got == want
