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


def test_frame_sample(docs):
    media = M.attach_payload(docs, "doc_id", "text").limit(3)
    frames = M.frame_sample_stub(media, every_n_bytes=50).collect()
    assert all(r["byte_offset"] % 50 == 0 for r in frames)
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r["frame_idx"])
    for idxs in by_media.values():
        assert sorted(idxs) == list(range(len(idxs)))
