"""The REAL media decode path (pure-numpy PPM/P6 codec +
actor-pool decode stage, pipelines/media.py)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def test_ppm_roundtrip_random_images():
    from pdf_ocr_api_ray.pipelines.media import decode_ppm, encode_ppm

    rng = np.random.RandomState(9)
    for h, w in ((1, 1), (3, 7), (40, 33), (128, 64)):
        img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_ppm(encode_ppm(img)), img)


def test_ppm_header_edge_cases():
    from pdf_ocr_api_ray.pipelines.media import decode_ppm

    img = decode_ppm(b"P6\n# a comment\n 2 \t1\n255\n" + bytes(6))
    assert img.shape == (1, 2, 3)
    with pytest.raises(ValueError, match="not a P6"):
        decode_ppm(b"P3\n1 1\n255\n000")
    with pytest.raises(ValueError, match="payload"):
        decode_ppm(b"P6\n2 2\n255\n" + bytes(5))  # truncated pixels
    with pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n1 1\n65535\n" + bytes(6))


def test_resize_nearest_deterministic():
    from pdf_ocr_api_ray.pipelines.media import resize_nearest

    img = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(6, 4, 3)
    out = resize_nearest(img, 2)
    assert out.shape == (3, 2, 3)
    # idx = floor(i * src / dst): rows 0,2,4; cols 0,2
    assert np.array_equal(out, img[[0, 2, 4]][:, [0, 2], :])


def test_media_decode_ppm_pipeline_vs_sql(ray_session):
    """The decoded features are SQL-reproducible because the SYNTH
    payload derives from row scalars — but the pipeline path really
    parses bytes (magic/header/payload validation), so a decoder bug
    (wrong dims, channel swap, off-by-one header scan) breaks parity."""
    from pdf_ocr_api_ray.pipelines.media import media_decode_ppm

    got = (
        media_decode_ppm(SF)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert got["ok"].all()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    exp = con.execute(
        """
        WITH dims AS (
            SELECT doc_id,
                   32 + (n_chars % 97) AS w,
                   16 + (doc_id % 53) AS h,
                   (doc_id * 7) % 256 AS r,
                   (doc_id * 13) % 256 AS g,
                   (n_chars * 31) % 256 AS b
            FROM documents
        ),
        rs AS (
            SELECT *, greatest(1, CAST(floor(h * 64.0 / w + 0.5) AS BIGINT)) AS oh
            FROM dims
        )
        SELECT doc_id, TRUE AS ok,
               CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
               CAST(r AS BIGINT) AS mean_r, CAST(g AS BIGINT) AS mean_g,
               CAST(b AS BIGINT) AS mean_b,
               CAST(64 AS BIGINT) AS out_w, oh AS out_h,
               oh * 64 * (r + g + b) AS resized_sum
        FROM rs ORDER BY doc_id
        """
    ).df()
    pd.testing.assert_frame_equal(
        got.astype({"doc_id": "int64"}), exp.astype({"doc_id": "int64"}), check_dtype=False
    )


def test_malformed_payload_quarantined(ray_session):
    from pdf_ocr_api_ray.pipelines.media import PpmDecoder

    dec = PpmDecoder(target_w=8)
    df = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "payload": [b"garbage bytes", b"P6\n2 1\n255\n" + bytes(6)],
        }
    )
    out = dec(df)
    assert out["ok"].tolist() == [False, True]
    assert out.loc[1, "width"] == 2 and out.loc[1, "out_w"] == 8


def test_zero_dimension_payload_quarantined(ray_session):
    """Zero-width/height headers pass the length check vacuously
    (0 == 0) — they must be REJECTED at decode so the pipeline
    quarantines the row instead of dying in resize (code-review
    repro: ZeroDivisionError on w=0, IndexError on h=0)."""
    from pdf_ocr_api_ray.pipelines.media import PpmDecoder, decode_ppm

    with pytest.raises(ValueError, match="dimensions"):
        decode_ppm(b"P6\n0 16\n255\n")
    with pytest.raises(ValueError, match="dimensions"):
        decode_ppm(b"P6\n5 0\n255\n")

    dec = PpmDecoder(target_w=8)
    out = dec(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "payload": [
                    b"P6\n0 16\n255\n",
                    b"P6\n5 0\n255\n",
                    b"P6\n1 1\n255\n" + bytes(3),
                ],
            }
        )
    )
    assert out["ok"].tolist() == [False, False, True]


# ---------------------------------------------------------------------------
# Perceptual average-hash dedup
# ---------------------------------------------------------------------------


def test_ahash64_hand_computed():
    """2×2 image, values chosen so the 8×8 nearest grid samples each
    quadrant: gray cells are 10/10/10/100 per quadrant -> mean 32 ->
    only the bright quadrant's 16 cells set."""
    import numpy as np

    from pdf_ocr_api_ray.pipelines.media import ahash64

    img = np.zeros((2, 2, 3), dtype=np.uint8)
    img[0, 0] = img[0, 1] = img[1, 0] = 10
    img[1, 1] = 100
    h = ahash64(img)
    # grid rows 0-3 sample source row 0, rows 4-7 source row 1; same for
    # columns — bright cells are grid (4..7, 4..7): bits 36..39 etc.
    expect = 0
    for cy in range(4, 8):
        for cx in range(4, 8):
            expect |= 1 << (63 - (cy * 8 + cx))
    assert h == expect


def test_media_phash_dup_equals_bruteforce(ray_session):
    """Distributed pigeonhole output == all-pairs popcount reference
    (exactness of the blocking), and the planted same-group pairs are
    present: identical copies at hamming 0, perturbed at 1-3."""
    import numpy as np
    import pyarrow.parquet as pq

    from pdf_ocr_api_ray.pipelines.media import (
        ahash64,
        decode_ppm,
        media_phash_dup,
        synth_ppm_gradient,
    )

    ids = sorted(
        pq.read_table(
            "/root/testdata/sf0.001/documents.parquet", columns=["doc_id"]
        )["doc_id"].to_pylist()
    )
    hs = {d: ahash64(decode_ppm(synth_ppm_gradient(int(d)))) for d in ids}
    expect = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            hd = bin(hs[ids[i]] ^ hs[ids[j]]).count("1")
            if hd <= 3:
                expect.add((ids[i], ids[j], hd))

    out = media_phash_dup("/root/testdata/sf0.001").to_pandas()
    got = set(map(tuple, out[["id_a", "id_b", "hamming"]].astype(int).values.tolist()))
    assert got == expect

    by_pair = {(a, b): h for a, b, h in got}
    n_perturbed_found = 0
    for e in range(0, 500, 2):
        o = e + 1
        if o >= 500:
            continue
        if o % 4 == 3:
            # identical render — guaranteed hamming 0, cannot be missed
            assert by_pair.get((e, o)) == 0, (e, o)
        elif (e, o) in by_pair:
            # perturbed render: 2 cells flip directly, but the mean
            # shift can flip borderline cells past max_hamming — the
            # pair is then legitimately absent (set equality above
            # already pinned exactness); count the ones that survive
            assert 1 <= by_pair[(e, o)] <= 3
            n_perturbed_found += 1
    assert n_perturbed_found > 50  # the planted near-dups are found en masse


# ---------- BMP (second real format) ----------


def test_bmp_roundtrip_exercises_padding_and_flip():
    """encode→decode identity across widths that hit every 4-byte row
    padding residue (w*3 % 4 ∈ {0,1,2,3}) — the BMP traps (bottom-up
    rows, BGR order, padded rows) must cancel exactly."""
    import numpy as np

    from pdf_ocr_api_ray.pipelines.media import decode_bmp, encode_bmp

    rng = np.random.RandomState(3)
    for w in (4, 5, 6, 7):
        img = rng.randint(0, 256, size=(9, w, 3), dtype=np.uint8)
        back = decode_bmp(encode_bmp(img))
        assert back.shape == img.shape
        assert (back == img).all(), f"w={w}"


def test_bmp_rejects_malformed_variants():
    import numpy as np
    import pytest

    from pdf_ocr_api_ray.pipelines.media import decode_bmp, encode_bmp

    good = encode_bmp(np.zeros((4, 4, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_bmp(b"XX" + good[2:])  # wrong magic
    with pytest.raises(ValueError):
        decode_bmp(good[:40])  # truncated header
    with pytest.raises(ValueError):
        decode_bmp(good[:-5])  # truncated payload
    # compressed variant (biCompression=1) must be refused, not misread
    bad_comp = bytearray(good)
    bad_comp[30] = 1
    with pytest.raises(ValueError):
        decode_bmp(bytes(bad_comp))
    # 32-bit variant refused
    bad_bpp = bytearray(good)
    bad_bpp[28] = 32
    with pytest.raises(ValueError):
        decode_bmp(bytes(bad_bpp))


# ---------- PNG (fourth real format: DEFLATE + filter reconstruction) ----------


def test_png_roundtrip_exercises_all_five_filters():
    """encode→decode identity on random images tall enough that the
    default row%5 filter cycle applies every spec filter (None / Sub /
    Up / Average / Paeth) — forward filtering and inverse
    reconstruction are separate code paths, so a bug in either breaks
    this for real pixel data."""
    import numpy as np

    from pdf_ocr_api_ray.pipelines.media import decode_png, encode_png

    rng = np.random.RandomState(7)
    for h, w in ((11, 4), (7, 13), (6, 1)):
        img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        back = decode_png(encode_png(img))
        assert back.shape == img.shape
        assert (back == img).all(), f"{h}x{w}"
    # each filter type alone, too (isolates which rule broke)
    img = rng.randint(0, 256, size=(5, 6, 3), dtype=np.uint8)
    for f in range(5):
        back = decode_png(encode_png(img, filters=[f] * 5))
        assert (back == img).all(), f"filter {f}"


def test_png_container_structure_is_spec_pinned():
    """Independent of decode_png: a filter-0 PNG's IDAT must zlib-
    inflate to exactly the spec scanline layout (one 0x00 filter byte
    + w*3 literal pixel bytes per row), and the signature/IHDR fields
    must sit at their spec offsets — pins the container format against
    a matched encoder/decoder bug pair."""
    import struct
    import zlib

    import numpy as np

    from pdf_ocr_api_ray.pipelines.media import encode_png

    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    data = encode_png(img, filters=[0, 0])
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    # IHDR: first chunk, fixed offset
    assert data[12:16] == b"IHDR"
    w, h, depth, color = struct.unpack(">IIBB", data[16:26])
    assert (w, h, depth, color) == (3, 2, 8, 2)
    # locate IDAT, inflate, compare to literal scanlines
    i = data.index(b"IDAT")
    (length,) = struct.unpack(">I", data[i - 4 : i])
    raw = zlib.decompress(data[i + 4 : i + 4 + length])
    expect = b"\x00" + img[0].tobytes() + b"\x00" + img[1].tobytes()
    assert raw == expect


def test_png_rejects_malformed_variants():
    import struct
    import zlib

    import numpy as np
    import pytest

    from pdf_ocr_api_ray.pipelines.media import decode_png, encode_png

    good = encode_png(np.full((4, 4, 3), 9, dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_png(b"\x89PNX" + good[4:])  # wrong signature
    with pytest.raises(ValueError):
        decode_png(good[:20])  # truncated mid-chunk
    # flip one IDAT byte → CRC mismatch must be caught, not misdecoded
    bad = bytearray(good)
    bad[good.index(b"IDAT") + 6] ^= 0xFF
    with pytest.raises(ValueError):
        decode_png(bytes(bad))
    # unsupported variant: grayscale color type (rebuild IHDR with a
    # valid CRC so the variant check itself is what fires)
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    chunk = (
        struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(ValueError):
        decode_png(good[:8] + chunk + good[8 + len(chunk) :])


def test_decode_image_dispatches_on_magic():
    import numpy as np
    import pytest

    from pdf_ocr_api_ray.pipelines.media import (
        decode_image,
        encode_bmp,
        encode_ppm,
    )

    img = np.full((3, 5, 3), 17, dtype=np.uint8)
    from pdf_ocr_api_ray.pipelines.media import encode_png

    for enc, fmt in (
        (encode_ppm, "ppm"),
        (encode_bmp, "bmp"),
        (encode_png, "png"),
    ):
        back, got_fmt = decode_image(enc(img))
        assert got_fmt == fmt and (back == img).all()
    with pytest.raises(ValueError):
        decode_image(b"GIF89a not supported")


def test_media_features_mixed_formats_real_decode(ray_session):
    """media_features parses a MIXED PPM/BMP/PNG binary column: every
    row decodes ok, the format split follows doc_id % 3, and the means
    equal the synth colors (pinning BGR→RGB, row-order handling and
    the PNG filter reconstruction — a channel swap, flip or filter bug
    would shift mean_r/mean_b)."""
    from pdf_ocr_api_ray.pipelines.media import media_features

    out = media_features("/root/testdata/sf0.001").to_pandas()
    assert len(out) == 500
    assert out["ok"].all()
    mod = out["doc_id"] % 3
    assert (out.loc[mod == 0, "format"] == "ppm").all()
    assert (out.loc[mod == 1, "format"] == "bmp").all()
    assert (out.loc[mod == 2, "format"] == "png").all()
    assert (out["mean_r"] == (out["doc_id"] * 7) % 256).all()


# ---------- WAV (third real format: RIFF PCM16 audio) ----------


def test_wav_roundtrip_mono_and_stereo():
    import numpy as np

    from pdf_ocr_api_ray.pipelines.media import decode_wav, encode_wav

    rng = np.random.RandomState(5)
    for ch in (1, 2):
        a = rng.randint(-(2**15), 2**15, size=(101, ch)).astype(np.int16)
        back, rate = decode_wav(encode_wav(a, sample_rate=22050))
        assert rate == 22050
        assert back.shape == a.shape and (back == a).all()


def test_wav_chunk_walk_skips_unknown_chunks():
    """Real RIFF files carry LIST/INFO chunks before data — the parser
    must skip unknown chunks (word-aligned) and still find fmt+data."""
    import struct

    import numpy as np

    from pdf_ocr_api_ray.pipelines.media import decode_wav, encode_wav

    a = np.arange(7, dtype=np.int16)[:, None]
    raw = encode_wav(a, sample_rate=8000)
    # splice an odd-sized junk chunk (tests word alignment) after fmt
    head, data_chunk = raw[:36], raw[36:]
    junk = b"JUNK" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad byte
    spliced = head[:12] + head[12:36] + junk + data_chunk
    # fix RIFF size
    spliced = b"RIFF" + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    back, rate = decode_wav(spliced)
    assert rate == 8000 and (back == a).all()


def test_wav_rejects_malformed_variants():
    import struct

    import numpy as np
    import pytest

    from pdf_ocr_api_ray.pipelines.media import decode_wav, encode_wav

    good = encode_wav(np.zeros((10, 1), dtype=np.int16))
    with pytest.raises(ValueError):
        decode_wav(b"RIFX" + good[4:])  # wrong magic
    with pytest.raises(ValueError):
        decode_wav(good[:-3])  # truncated data chunk
    # non-PCM format code refused
    bad = bytearray(good)
    struct.pack_into("<H", bad, 20, 3)  # IEEE float
    with pytest.raises(ValueError):
        decode_wav(bytes(bad))
    # 8-bit refused
    bad = bytearray(good)
    struct.pack_into("<H", bad, 34, 8)
    with pytest.raises(ValueError):
        decode_wav(bytes(bad))


def test_media_audio_features_real_parse(ray_session):
    """The audio pipeline really parses the RIFF bytes: every row ok,
    features match the synth arithmetic recomputed straight-line."""
    import numpy as np

    from pdf_ocr_api_ray.pipelines.media import media_audio_features

    out = (
        media_audio_features("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert len(out) == 500 and out["ok"].all()
    d = out["doc_id"].to_numpy()
    assert (out["sample_rate"] == 8000 + 1000 * (d % 5)).all()
    assert (out["channels"] == 1).all()
    # spot-check one doc's peak/abs_sum against straight-line numpy
    row = out.iloc[7]
    import pyarrow.parquet as pq

    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "n_chars"]
    ).to_pandas().set_index("doc_id")
    n_chars = int(docs.loc[row["doc_id"], "n_chars"])
    n = 64 + (n_chars % 257)
    period = 8 + (int(row["doc_id"]) % 13)
    amp = 100 + (int(row["doc_id"]) % 900)
    i = np.arange(n)
    phase = i % period
    tri = np.where(phase * 2 < period, phase, period - phase)
    assert row["n_samples"] == n
    assert row["peak"] == (tri * amp).max()
    assert row["abs_sum"] == (tri * amp).sum()
