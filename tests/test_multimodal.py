"""Multimodal stage plumbing: media spans → decode(STUB) → features."""

import numpy as np
import pyarrow as pa
import pytest

from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines.multimodal import (
    FrameSampler,
    MediaFeatureExtractor,
    decode_image,
    media_rows_from_spans,
    _synthetic_payload,
)


def _pages_batch():
    spans = [
        [
            {"kind": "title", "text": "t", "media_ref": "", "offset": 0},
            {"kind": "media", "text": "", "media_ref": "/static/a.png", "offset": 10},
            {"kind": "media", "text": "", "media_ref": "/static/b.mp4", "offset": 20},
        ],
        [
            {"kind": "text", "text": "x", "media_ref": "", "offset": 0},
        ],
    ]
    return pa.table(
        {
            "url_hash": pa.array(["h1", "h2"], pa.string()),
            "spans": pa.array(
                spans,
                pa.list_(
                    pa.struct(
                        [
                            ("kind", pa.string()),
                            ("text", pa.string()),
                            ("media_ref", pa.string()),
                            ("offset", pa.int32()),
                        ]
                    )
                ),
            ),
        }
    )


def test_media_rows_extracted_with_types():
    t = media_rows_from_spans(_pages_batch())
    assert t.num_rows == 2
    assert t["media_type"].to_pylist() == ["image", "video"]
    assert all(length > 0 for length in t["payload_len"].to_pylist())


def test_decode_stub_deterministic_and_fails_on_empty():
    p = _synthetic_payload("/static/a.png")
    img1, img2 = decode_image(p), decode_image(p)
    assert img1.shape == (16, 16)
    assert np.array_equal(img1, img2)
    with pytest.raises(ValueError):
        decode_image(b"")


def test_feature_extractor_batch():
    t = media_rows_from_spans(_pages_batch())
    out = MediaFeatureExtractor()(t)
    assert out.num_rows == 2
    assert not any(out["decode_failed"].to_pylist())
    feats = out["features"].to_pylist()
    assert all(len(f) == 32 for f in feats)
    # deterministic across instances (same seeded 'model')
    out2 = MediaFeatureExtractor()(t)
    assert out["features"].to_pylist() == out2["features"].to_pylist()


def test_image_resizer_batch():
    from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines.multimodal import (
        ImageResizer,
    )

    t = media_rows_from_spans(_pages_batch())
    out = ImageResizer(target=(8, 8))(t)
    assert out.num_rows == t.num_rows
    assert not any(out["decode_failed"].to_pylist())
    assert out["height"].to_pylist() == [8] * t.num_rows
    assert out["width"].to_pylist() == [8] * t.num_rows
    for pay in out["payload"].to_pylist():
        assert len(pay) == 64  # 8x8 uint8
    # deterministic + 2x2 block means of the 16x16 stub decode
    img = decode_image(t["payload"][0].as_py())
    resized = np.frombuffer(out["payload"][0].as_py(), dtype=np.uint8).reshape(8, 8)
    expect = img.reshape(8, 2, 8, 2).mean(axis=(1, 3)).astype(np.uint8)
    assert np.array_equal(resized, expect)


def test_image_resizer_empty_payload_marks_failed():
    from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines.multimodal import (
        ImageResizer,
    )
    import pyarrow as pa

    t = pa.table(
        {
            "doc_id": ["d"],
            "media_ref": ["/static/x.png"],
            "media_type": ["image"],
            "payload": pa.array([b""], pa.binary()),
            "payload_len": pa.array([0], pa.int32()),
        }
    )
    out = ImageResizer()(t)
    assert out["decode_failed"].to_pylist() == [True]
    assert out["height"].to_pylist() == [0]


def test_frame_sampler():
    t = media_rows_from_spans(_pages_batch())
    vids = t.filter(pa.compute.equal(t["media_type"], "video"))
    out = FrameSampler(n_frames=3)(vids)
    assert out.num_rows == 3
    assert out["frame_idx"].to_pylist() == [0, 1, 2]


def test_pipeline_end_to_end(ray_session):
    from distributed_web_search_engine_crawler_indexing_pagerank__ray.pipelines.multimodal import (
        q_media_features,
    )

    out = q_media_features("/root/testdata/sf0.001")
    assert out.num_rows > 0
    assert set(out["media_type"].to_pylist()) <= {"image", "audio", "video", "other"}
