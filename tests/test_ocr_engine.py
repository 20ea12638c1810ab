"""OCR engine plumbing: bucket grouping, batching, det->rec flow.

Runs with random-init weights (no trained checkpoints in this environment):
asserts shapes, bucketing discipline and recompile bounds, not text quality
(quality is covered by the torch parity tests + future weight conversion).
"""
import numpy as np
import pytest

from rapiddoc_tpu.engine.buckets import BucketSpec, group_by_bucket


def test_bucket_grouping():
    spec = BucketSpec(stride=160, min_side=320, max_side=1280)
    groups = group_by_bucket([(300, 500), (310, 490), (900, 700)], spec)
    assert (320, 640) in groups and len(groups[(320, 640)]) == 2
    assert (960, 800) in groups


def test_bucket_batch_sizes():
    spec = BucketSpec(batch_sizes=(4, 8, 16))
    assert spec.bucket_batch(1) == 4
    assert spec.bucket_batch(9) == 16
    assert spec.bucket_batch(100) == 16


@pytest.fixture(scope="module")
def text_system():
    from rapiddoc_tpu.models.ocr.engine import (
        TextDetector,
        TextRecognizer,
        TextSystem,
    )
    from rapiddoc_tpu.engine.buckets import BucketSpec

    det = TextDetector(
        bucket_spec=BucketSpec(stride=160, min_side=160, max_side=320,
                               batch_sizes=(1, 2, 4)),
        limit_side_len=320,
    )
    rec = TextRecognizer(
        charset=[chr(33 + i) for i in range(60)],
        bucket_spec=BucketSpec(heights=(48,), widths=(80, 160),
                               batch_sizes=(2, 4)),
    )
    return TextSystem(det, rec, drop_score=0.0)


def test_det_runs_and_buckets(text_system):
    det = text_system.detector
    imgs = [
        np.random.randint(0, 255, (200, 300, 3), np.uint8),
        np.random.randint(0, 255, (210, 290, 3), np.uint8),
        np.random.randint(0, 255, (120, 100, 3), np.uint8),
    ]
    results = det(imgs)
    assert len(results) == 3
    for r in results:
        assert r.boxes.ndim == 3 and r.boxes.shape[1:] == (4, 2)
    # same-bucket images must not trigger extra compiles
    assert det.session.stats.compiles <= 2


def test_rec_runs(text_system):
    rec = text_system.recognizer
    crops = [
        np.random.randint(0, 255, (32, 100, 3), np.uint8),
        np.random.randint(0, 255, (30, 60, 3), np.uint8),
        np.random.randint(0, 255, (40, 200, 3), np.uint8),
    ]
    out = rec(crops)
    assert len(out) == 3
    for r in out:
        assert isinstance(r.text, str)
        assert 0.0 <= r.score <= 1.0


def test_full_system(text_system):
    img = np.full((200, 200, 3), 255, np.uint8)
    img[50:70, 20:180] = 0  # a dark bar: random weights may or may not box it
    out = text_system([img])
    assert len(out) == 1
    for item in out[0]:
        assert set(item) >= {"box", "text", "score"}


def test_crop_quad_vertical_rotation():
    from rapiddoc_tpu.models.ocr.engine import crop_quad

    img = np.random.randint(0, 255, (300, 300, 3), np.uint8)
    quad = np.array([[10, 10], [40, 10], [40, 200], [10, 200]], np.float32)
    crop = crop_quad(img, quad)
    assert crop.shape[1] > crop.shape[0]  # rotated to horizontal
