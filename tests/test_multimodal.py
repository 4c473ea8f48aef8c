"""Multimodal plumbing tests: schema/batch-shape contracts of the
mapInPandas stages (decode stub, resize, frame sampling)."""

import sys

import pytest

sys.path.insert(0, "/root/repo")

from datafusion_geo_spark.operators.multimodal import (decode_features,
                                                       resize_images,
                                                       sample_frames,
                                                       to_media)


@pytest.fixture(scope="module")
def media(spark):
    df = spark.createDataFrame(
        [(1, "a" * 300), (2, "xy"), (3, "b" * 128)], "doc_id long, text string")
    return to_media(df)


def test_resize_fixed_payload_size(spark, media):
    out = resize_images(media, width=4, height=4).collect()
    assert {r.doc_id for r in out} == {1, 2, 3}
    for r in out:
        assert len(r.payload) == 16
        assert (r.width, r.height) == (4, 4)


def test_resize_real_decode_raises(spark, media):
    with pytest.raises(NotImplementedError):
        resize_images(media, real_decode=True)


def test_sample_frames_explosion(spark, media):
    rows = sample_frames(media, frame_size=64, stride=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # 300 bytes, step 128 -> offsets 0, 128, 256 -> 3 frames
    assert len(by_doc[1]) == 3
    assert [r.byte_offset for r in sorted(by_doc[1], key=lambda r: r.frame_idx)] \
        == [0, 128, 256]
    assert len(by_doc[1][0].frame) == 64
    # last frame is the 300-256=44-byte tail
    assert len(sorted(by_doc[1], key=lambda r: r.frame_idx)[-1].frame) == 44
    # 2-byte doc -> single short frame
    assert len(by_doc[2]) == 1 and len(by_doc[2][0].frame) == 2
