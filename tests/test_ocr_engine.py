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


def test_split_words_mixed():
    from rapiddoc_tpu.models.ocr.pre_post import split_words

    text = "Hello 世界 ab"
    frames = list(range(len(text)))
    words = split_words(text, frames)
    assert [w[0] for w in words] == ["Hello", "世", "界", "ab"]
    assert words[0][1] == 0 and words[0][2] == 4
    assert words[1][1] == words[1][2] == 6


def test_word_boxes_in_crop_monotonic():
    from rapiddoc_tpu.models.ocr.pre_post import split_words, word_boxes_in_crop

    words = split_words("ab cd", [0, 1, 3, 4])
    boxes = word_boxes_in_crop(words, 6, 120, 48)
    assert len(boxes) == 2
    assert boxes[0][0] < boxes[0][2] <= boxes[1][0] < boxes[1][2] <= 120


def test_map_crop_box_to_quad_identity():
    import numpy as np

    from rapiddoc_tpu.models.ocr.pre_post import map_crop_box_to_quad

    quad = np.array([[10, 20], [110, 20], [110, 60], [10, 60]], np.float32)
    poly = map_crop_box_to_quad([0, 0, 100, 40], 100, 40, quad)
    assert np.allclose(poly, quad, atol=1e-3)
    half = map_crop_box_to_quad([0, 0, 50, 40], 100, 40, quad)
    assert np.allclose(half[1], [60, 20], atol=1e-3)


def test_text_system_word_boxes(text_system):
    import cv2

    img = np.full((100, 300, 3), 255, np.uint8)
    cv2.putText(img, "AB CD", (10, 60), cv2.FONT_HERSHEY_SIMPLEX, 1.2,
                (0, 0, 0), 2)
    out = text_system([img], return_word_boxes=True)
    for it in out[0]:
        if it.get("words"):
            for w in it["words"]:
                assert len(w["poly"]) == 4
                xs = [p[0] for p in w["poly"]]
                assert max(xs) <= 301 and min(xs) >= -1


def test_recompile_count_is_bucket_bound():
    """SURVEY hard part #2: recompiles stay O(buckets), not O(inputs)."""
    import jax.numpy as jnp

    from rapiddoc_tpu.engine.buckets import BucketSpec
    from rapiddoc_tpu.engine.session import JaxSession

    spec = BucketSpec(heights=(32,), widths=(32, 64), batch_sizes=(2, 4))
    sess = JaxSession(
        lambda v, x: x.mean(axis=(1, 2, 3)), {}, spec, name="probe",
        multi_device=False,
    )
    import numpy as np

    rng = np.random.default_rng(0)
    for _ in range(20):
        w = int(rng.choice([32, 64]))
        n = int(rng.integers(1, 5))
        batch = rng.integers(0, 255, (n, 32, w, 3), np.uint8)
        sess(batch)
    # 2 widths x 2 batch buckets = at most 4 programs for 20 calls
    assert sess.stats.compiles <= 4
    assert sess.stats.calls == 20


def test_dispatch_oversized_batch_chunks():
    """A batch larger than the biggest bucket is split into bucket-sized
    chunks and merged on device (regression: 12-page window vs 8-max
    layout bucket raised 'negative dimensions')."""
    import numpy as np

    from rapiddoc_tpu.engine.buckets import BucketSpec
    from rapiddoc_tpu.engine.session import JaxSession

    spec = BucketSpec(heights=(16,), widths=(16,), batch_sizes=(2, 4))
    sess = JaxSession(
        lambda v, x: x.mean(axis=(1, 2, 3)), {}, spec, name="probe",
        multi_device=False,
    )
    batch = np.arange(11 * 16 * 16 * 3, dtype=np.uint8).reshape(11, 16, 16, 3)
    out = sess(batch)
    assert out.shape[0] == 11
    expect = batch.astype(np.float32).mean(axis=(1, 2, 3)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=2e-2)
    # 11 rows -> chunks of 4+4+3 -> buckets 4,4,4: only one program
    assert sess.stats.compiles <= 2


def test_contrast_stretch_restores_washed_ink():
    """pre_post.contrast_stretch: faded ink re-spans [0,255]; full-range
    and flat images pass through unchanged."""
    import numpy as np

    from rapiddoc_tpu.models.ocr.pre_post import contrast_stretch

    # text-like bimodal image: dark ink on white already spans the range
    rng = np.random.default_rng(0)
    clean = np.where(
        rng.random((48, 160, 3)) < 0.15,
        rng.integers(0, 6, (48, 160, 3)),
        rng.integers(250, 256, (48, 160, 3)),
    ).astype(np.uint8)
    assert contrast_stretch(clean) is clean  # already full range

    washed = (140 + clean.astype(np.float32) * 0.3).astype(np.uint8)
    out = contrast_stretch(washed)
    assert out.min() <= 5 and out.max() >= 250
    # monotone: darker stays darker
    assert out[washed == washed.min()].max() <= out[washed == washed.max()].min()

    flat = np.full((48, 160, 3), 180, np.uint8)
    assert contrast_stretch(flat) is flat  # degenerate window untouched
