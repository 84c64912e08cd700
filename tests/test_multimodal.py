"""Multimodal plumbing tests: binary payloads through Arrow batches."""

from dataframe_spark.operators import multimodal as M


def test_attach_payload_schema(docs):
    media = M.attach_payload(docs, "doc_id", "text")
    assert [f.name for f in media.schema.fields] == [
        "media_id", "payload", "mime", "byte_length",
    ]
    row = media.first()
    assert isinstance(row["payload"], bytearray) or isinstance(row["payload"], bytes)
    assert row["byte_length"] == len(row["payload"])


def test_extract_image_features(docs):
    media = M.attach_payload(docs, "doc_id", "text").limit(20)
    feats = M.extract_image_features(media)
    rows = feats.collect()
    assert len(rows) == 20
    for r in rows:
        assert 64 <= r["width"] < 128
        assert 0 <= r["mean_luma"] < 256


def test_resize_stub_bounds_payload(docs):
    media = M.attach_payload(docs, "doc_id", "text").limit(5)
    out = M.resize_stub(media, 4, 4).collect()
    assert all(r["byte_length"] <= 16 for r in out)


def test_image_ahash_closed_form(spark):
    import numpy as np
    import pytest
    from pyspark.sql import functions as F

    rows = [(1, b"A" * 96), (2, b"A" * 95 + b"Z"), (3, None), (4, b"")]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["id"]: r["ahash"] for r in M.image_ahash(df).collect()}
    # constant payload: every cell equals the mean -> no bit set
    assert got[1] == 0
    # replay the strided-sum spec for row 2
    b = np.frombuffer(b"A" * 95 + b"Z", dtype=np.uint8).astype(np.int64)
    grid = np.bincount(np.arange(len(b)) % 48, weights=b, minlength=48)
    expect = int((1 << np.arange(48, dtype=np.int64))[grid > grid.mean()].sum())
    assert got[2] == expect
    assert got[3] is None and got[4] is None   # null/empty hash to null
    with pytest.raises(ValueError):
        M.image_ahash(df, cells=63)


def test_phash_pairs_match_brute_force(spark):
    import numpy as np
    import pytest

    rng = np.random.RandomState(11)
    base = rng.randint(32, 127, size=400, dtype=np.uint8)
    payloads = []
    for i in range(40):
        b = base.copy()
        # mutate i bytes: low i stays within hamming 3, high i drifts out
        for j in range(i):
            b[(7 * j) % len(b)] = 32 + ((b[(7 * j) % len(b)] + 13) % 95)
        payloads.append((i, bytes(b)))
    df = spark.createDataFrame(payloads, "media_id long, payload binary")
    got = {(r["a_id"], r["b_id"]): r["hamming"]
           for r in M.phash_pairs(df).collect()}

    def ahash(p):
        b = np.frombuffer(p, dtype=np.uint8).astype(np.int64)
        g = np.bincount(np.arange(len(b)) % 48, weights=b, minlength=48)
        return int((1 << np.arange(48, dtype=np.int64))[g > g.mean()].sum())

    hs = {i: ahash(p) for i, p in payloads}
    brute = {}
    for i in range(40):
        for j in range(i + 1, 40):
            d = bin(hs[i] ^ hs[j]).count("1")
            if d <= 3:
                brute[(i, j)] = d
    assert got == brute and len(brute) > 5   # banding is complete
    with pytest.raises(ValueError):
        M.phash_pairs(df, max_hamming=4)
    with pytest.raises(ValueError):
        M.phash_pairs(df, cells=50)


def test_image_quality_gates(spark):
    rows = [(1, b"x" * 500), (2, b"\x00" * 200), (3, None)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    media = df.selectExpr("media_id", "payload", "'x' AS mime",
                          "cast(500 as bigint) AS byte_length")
    out = {r["media_id"]: r for r in M.image_quality(media).collect()}
    # constant payload: zero entropy -> gated out
    assert out[1]["entropy"] == 0.0 and out[1]["keep"] is False
    assert out[2]["entropy"] == 0.0 and out[2]["keep"] is False
    assert out[3]["width"] is None and out[3]["keep"] is False
    assert out[1]["aspect"] >= 1.0


def test_frame_sample(docs):
    media = M.attach_payload(docs, "doc_id", "text").limit(3)
    frames = M.frame_sample_stub(media, every_n_bytes=50).collect()
    assert all(r["byte_offset"] % 50 == 0 for r in frames)
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r["frame_idx"])
    for idxs in by_media.values():
        assert sorted(idxs) == list(range(len(idxs)))


def _have_pil():
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def test_pil_decoder_gate_is_clean_without_pil(spark, docs):
    """decoder='pil' must fail driver-side with one clear ImportError
    when Pillow is absent (never a py4j executor stack); the stub
    path needs nothing."""
    import pytest

    if _have_pil():
        pytest.skip("PIL installed: gate cannot fire")
    media = M.attach_payload(docs, "doc_id", "text").limit(2)
    with pytest.raises(ImportError, match="Pillow"):
        M.extract_image_features(media, decoder="pil")
    with pytest.raises(ImportError, match="Pillow"):
        M.image_ahash(media, decoder="pil")


def test_pil_decoder_real_jpeg(spark):
    """Real JPEG bytes through the import-gated decoder: dimensions
    and mean luma come from actual pixels, and near-identical images
    hash within a small hamming distance while the stub path still
    works on the same frame. Skipped when Pillow is absent."""
    import pytest

    if not _have_pil():
        pytest.skip("Pillow not installed in this container")
    import io

    import numpy as np
    from PIL import Image

    def jpeg(arr):
        buf = io.BytesIO()
        Image.fromarray(arr.astype(np.uint8), "L").save(buf, format="JPEG")
        return buf.getvalue()

    base = np.tile(np.arange(64, dtype=np.uint8), (32, 1)) * 4
    rows = [
        (1, jpeg(base)),
        (2, jpeg(np.clip(base + 2, 0, 255))),   # near-duplicate
        (3, jpeg(255 - base)),                   # inverted: far
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    media = df.selectExpr(
        "media_id", "payload", "'image/jpeg' AS mime",
        "cast(length(payload) as bigint) AS byte_length",
    )
    feats = {
        r["media_id"]: r
        for r in M.extract_image_features(media, decoder="pil").collect()
    }
    assert feats[1]["width"] == 64 and feats[1]["height"] == 32
    assert 0 <= feats[1]["mean_luma"] <= 255
    hashes = {
        r["id"]: r["ahash"]
        for r in M.image_ahash(media, cells=48, decoder="pil").collect()
    }
    near = bin(hashes[1] ^ hashes[2]).count("1")
    far = bin(hashes[1] ^ hashes[3]).count("1")
    assert near <= 4 < far
    # the stub path keeps working on the same payloads (oracle path)
    stub = M.image_ahash(media, cells=48).collect()
    assert len(stub) == 3


def _bmp(arr):
    """Encode an (h, w, 3) uint8 RGB array as an uncompressed 24-bit
    BMP (BITMAPINFOHEADER, bottom-up) in pure Python."""
    import numpy as np

    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    px = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up row order
        row = arr[y, :, ::-1].astype(np.uint8).tobytes()  # RGB -> BGR
        px += row + b"\x00" * (stride - len(row))
    off = 14 + 40
    size = off + len(px)
    header = (
        b"BM" + size.to_bytes(4, "little") + b"\x00\x00\x00\x00"
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + len(px).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return bytes(header + px)


def test_bmp_decoder_real_pixels(spark):
    """The dependency-free REAL decoder (r11): width/height/mean-luma
    come from actual decoded pixels (BT.601, cross-checked in numpy
    here), near-identical images hash close while a far image hashes
    far, undecodable payloads yield nulls — and this test NEVER
    skips, so CI always exercises a real decode path (VERDICT r10
    ask #6, Pillow absent in this container)."""
    import numpy as np

    rng = np.random.RandomState(5)
    base = rng.randint(0, 255, size=(10, 14, 3)).astype(np.uint8)
    near = np.clip(base.astype(int) + 2, 0, 255).astype(np.uint8)
    far = (255 - base).astype(np.uint8)
    rows = [
        (1, _bmp(base)), (2, _bmp(near)), (3, _bmp(far)),
        (4, b"not an image at all, just bytes"),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    media = df.selectExpr(
        "media_id", "payload", "'image/bmp' AS mime",
        "cast(length(payload) as bigint) AS byte_length",
    )
    feats = {
        r["media_id"]: r
        for r in M.extract_image_features(media, decoder="bmp").collect()
    }
    luma = (
        base[..., 0] * 0.299 + base[..., 1] * 0.587 + base[..., 2] * 0.114
    )
    assert feats[1]["width"] == 14 and feats[1]["height"] == 10
    assert feats[1]["mean_luma"] == int(luma.mean())
    assert feats[4]["width"] is None and feats[4]["mean_luma"] is None

    hashes = {
        r["id"]: r["ahash"]
        for r in M.image_ahash(media, cells=48, decoder="bmp").collect()
    }
    assert hashes[4] is None
    near_d = bin(hashes[1] ^ hashes[2]).count("1")
    far_d = bin(hashes[1] ^ hashes[3]).count("1")
    assert near_d <= 4 < far_d
    # local recompute of the exact grid -> hash (the decoder is a
    # pure function of the pixel bytes)
    flat = luma.reshape(-1)
    grid = np.array([c.mean() for c in np.array_split(flat, 48)])
    want = int((1 << np.arange(48, dtype=np.int64))[grid > grid.mean()].sum())
    assert hashes[1] == want


def test_bmp_decoder_topdown_and_padding(spark):
    """Top-down BMPs (negative height) and non-multiple-of-4 row
    widths decode identically to the equivalent bottom-up image."""
    import numpy as np

    from dataframe_spark.operators.multimodal import _bmp_pixels

    arr = np.arange(5 * 3 * 3, dtype=np.uint8).reshape(5, 3, 3)
    bu = _bmp(arr)
    px = _bmp_pixels(bu)
    assert px is not None and px.shape == (5, 3, 3)
    assert (px == arr).all()
    # flip to top-down: negate height, reverse row order in payload
    off = 54
    stride = (3 * 3 + 3) & ~3
    rows = [bu[off + i * stride: off + (i + 1) * stride] for i in range(5)]
    td = bytearray(bu[:off]) + b"".join(reversed(rows))
    td[22:26] = (-5).to_bytes(4, "little", signed=True)
    px2 = _bmp_pixels(bytes(td))
    assert px2 is not None and (px2 == arr).all()
