"""Real stdlib-only media codecs (BMP / WAV) + the end-to-end decode paths.

Retires the codec stub (VERDICT r04 #2): ``decode_image`` / ``decode_audio``
parse real on-disk containers with struct/wave + numpy, and the distributed
transforms (resize, features, frame sampling) run on REAL encoded bytes.
``NotImplementedError`` remains only for genuinely unsupported formats.
"""

import struct

import numpy as np
import pytest

from fastbloom_spark.functions.codecs import (decode_bmp, decode_wav,
                                              encode_bmp, encode_wav,
                                              sniff_media)


# ------------------------------------------------------------------- BMP --


@pytest.mark.parametrize("h,w", [(8, 8), (9, 7), (1, 1), (5, 31), (16, 3)])
def test_bmp_roundtrip_exact(h, w):
    # odd widths exercise the 4-byte row padding
    rng = np.random.default_rng(h * 100 + w)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    enc = encode_bmp(img)
    assert sniff_media(enc) == "bmp"
    assert (decode_bmp(enc) == img).all()


def test_bmp_top_down_rows():
    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    enc = bytearray(encode_bmp(img))
    # flip the height sign to top-down and re-order pixel rows to match
    h = 4
    w_bytes = (6 * 3 + 3) & ~3
    struct.pack_into("<i", enc, 14 + 8, -h)
    off = 54
    rows = [bytes(enc[off + i * w_bytes: off + (i + 1) * w_bytes])
            for i in range(h)]
    enc[off:] = b"".join(reversed(rows))
    assert (decode_bmp(bytes(enc)) == img).all()


def test_bmp_32bit_decode():
    # hand-build a 2x2 32-bit BMP (BGRA) and check the alpha strip + BGR swap
    px = [(10, 20, 30, 255), (40, 50, 60, 255),
          (70, 80, 90, 255), (100, 110, 120, 255)]  # BGRA, bottom-up rows
    pixel_data = b"".join(bytes(p) for p in px)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 32, 0,
                       len(pixel_data), 0, 0, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixel_data), 0, 0, 54)
    img = decode_bmp(header + info + pixel_data)
    assert img.shape == (2, 2, 3)
    # bottom-up: first stored row is the BOTTOM image row; BGR -> RGB
    assert tuple(img[1, 0]) == (30, 20, 10)
    assert tuple(img[0, 1]) == (120, 110, 100)


def test_bmp_unsupported_structures_raise():
    img = np.zeros((3, 3, 3), dtype=np.uint8)
    enc = bytearray(encode_bmp(img))
    bad_comp = bytearray(enc)
    struct.pack_into("<I", bad_comp, 14 + 16, 1)  # BI_RLE8
    with pytest.raises(ValueError, match="compressed"):
        decode_bmp(bytes(bad_comp))
    bad_bpp = bytearray(enc)
    struct.pack_into("<H", bad_bpp, 14 + 14, 8)  # paletted
    with pytest.raises(ValueError, match="not supported"):
        decode_bmp(bytes(bad_bpp))
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(bytes(enc[:-4]))
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"PNG...definitely not a bmp......" * 3)


# ------------------------------------------------------------------- WAV --


@pytest.mark.parametrize("channels", [1, 2])
def test_wav_roundtrip_exact(channels):
    rng = np.random.default_rng(channels)
    n = 500
    samples = rng.integers(-32768, 32768, (n, channels), dtype=np.int16)
    enc = encode_wav(samples if channels > 1 else samples[:, 0], 8000)
    assert sniff_media(enc) == "wav"
    rate, out = decode_wav(enc)
    assert rate == 8000 and out.shape == (n, channels)
    assert (out == samples).all()


# ------------------------------------------------- distributed real paths --


def test_synth_bmp_table_decodes_and_is_partition_invariant(spark):
    from fastbloom_spark.operators.multimodal import (decode_image,
                                                      synth_bmp_table)
    media = synth_bmp_table(spark, 40, seed=5, num_partitions=4)
    rows = media.toPandas()
    assert len(rows) == 40
    for _, r in rows.head(10).iterrows():
        img = decode_image(bytes(r.payload))
        assert img.shape == (r.height, r.width, 3)
    # identical payloads regardless of partitioning (deterministic per id)
    rows2 = synth_bmp_table(spark, 40, seed=5, num_partitions=9).toPandas()
    a = {int(r.media_id): bytes(r.payload) for _, r in rows.iterrows()}
    b = {int(r.media_id): bytes(r.payload) for _, r in rows2.iterrows()}
    assert a == b


def test_resize_media_real_bmp_end_to_end(spark):
    from fastbloom_spark.operators.multimodal import (decode_image,
                                                      resize_media,
                                                      synth_bmp_table)
    media = synth_bmp_table(spark, 25, seed=7, num_partitions=3)
    small = resize_media(media, out_width=5, out_height=4)  # no codec: real
    out = small.toPandas()
    assert len(out) == 25
    for _, r in out.iterrows():
        img = decode_image(bytes(r.payload))  # output is itself a real BMP
        assert img.shape == (4, 5, 3)
    # resize agrees with a driver-side numpy reference on one row
    src = media.filter("media_id = 3").toPandas().iloc[0]
    full = decode_image(bytes(src.payload))
    ys = np.arange(4) * full.shape[0] // 4
    xs = np.arange(5) * full.shape[1] // 5
    expect = full[ys[:, None], xs[None, :], :]
    got = decode_image(bytes(
        out.set_index("media_id").loc[3].payload))
    assert (got == expect).all()


def test_audio_features_real_wav(spark):
    from fastbloom_spark.operators.multimodal import (audio_features,
                                                      decode_audio,
                                                      synth_wav_table)
    media = synth_wav_table(spark, 12, seed=9, num_partitions=3)
    feats = audio_features(media).toPandas().set_index("media_id")
    assert len(feats) == 12
    # cross-check one row against a driver-side decode
    payload = bytes(media.filter("media_id = 4").toPandas().iloc[0].payload)
    rate, data = decode_audio(payload)
    mono = data.mean(axis=1)
    r = feats.loc[4]
    assert r.sample_rate == rate == 8000
    assert r.n_samples == len(mono)
    assert r.duration_s == pytest.approx(len(mono) / rate, abs=1e-6)
    assert r.rms == pytest.approx(
        float(np.sqrt(np.mean(mono.astype(np.float64) ** 2))), rel=1e-5)
    zc = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
    assert r.zero_cross_rate == pytest.approx(zc, abs=1e-5)


def test_audio_features_null_payload_and_bad_container(spark):
    import pandas as pd

    from fastbloom_spark.operators.multimodal import audio_features
    pdf = pd.DataFrame({
        "media_id": [1, 2],
        "kind": ["audio", "audio"],
        "width": [0, 0], "height": [0, 0],
        "n_bytes": [0, 0],
        "payload": [None, None],
    })
    df = spark.createDataFrame(
        pdf, "media_id long, kind string, width int, height int, "
             "n_bytes long, payload binary")
    out = audio_features(df).toPandas()
    assert len(out) == 2 and out.rms.isna().all()  # NULL-in -> NULL-out
    bad = df.withColumn("payload", __import__(
        "pyspark.sql.functions", fromlist=["lit"]).lit(b"not-audio"))
    with pytest.raises(Exception, match="unsupported audio container"):
        audio_features(bad).collect()


def test_media_features_on_real_bmp_payloads(spark):
    """The codec-free byte-histogram features run unchanged over REAL
    encoded payloads — and match a driver-side recomputation."""
    from fastbloom_spark.operators.multimodal import (media_features,
                                                      synth_bmp_table)
    media = synth_bmp_table(spark, 10, seed=11, num_partitions=2)
    feats = media_features(media, feature_dim=16).toPandas() \
        .set_index("media_id")
    payloads = {int(r.media_id): bytes(r.payload)
                for _, r in media.toPandas().iterrows()}
    for mid, b in payloads.items():
        arr = np.frombuffer(b, dtype=np.uint8) >> 4
        expect = (np.bincount(arr, minlength=16) / len(b)).round(6)
        assert np.allclose(feats.loc[mid].feature, expect)


def test_sample_frames_on_real_wav_bytes(spark):
    """Pure-JVM frame slicing over real WAV payloads (kind relabeled video
    for the operator's filter): frames tile the payload exactly."""
    from pyspark.sql import functions as F

    from fastbloom_spark.operators.multimodal import (sample_frames,
                                                      synth_wav_table)
    media = synth_wav_table(spark, 6, seed=13).withColumn(
        "kind", F.lit("video"))
    frames = sample_frames(media, frame_bytes=64, every_n=2).toPandas()
    payloads = {int(r.media_id): bytes(r.payload)
                for _, r in media.toPandas().iterrows()}
    assert len(frames) > 0
    for _, fr in frames.iterrows():
        b = payloads[int(fr.media_id)]
        start = int(fr.frame_idx) * 64
        assert bytes(fr.frame) == b[start:start + 64]
