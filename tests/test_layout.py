"""Layout detector: RT-DETR structure, postprocess, NMS semantics."""
import numpy as np
import pytest


def test_class_nms_same_vs_diff():
    from rapiddoc_tpu.models.layout.engine import class_nms

    boxes = np.array(
        [[0, 0, 100, 100], [5, 5, 105, 105], [2, 2, 98, 98]], dtype=float
    )
    scores = np.array([0.9, 0.8, 0.7])
    labels_same = np.array([1, 1, 1])
    keep = class_nms(boxes, scores, labels_same, iou_same=0.6, iou_diff=0.98)
    assert keep == [0]
    # different classes survive unless nearly identical
    labels_diff = np.array([1, 2, 3])
    keep = class_nms(boxes, scores, labels_diff, iou_same=0.6, iou_diff=0.98)
    assert len(keep) == 3


@pytest.fixture(scope="module")
def tiny_layout():
    from rapiddoc_tpu.models.layout.engine import LayoutConfig, LayoutDetector

    cfg = LayoutConfig(
        model_size="B0", input_size=160, num_queries=30, dec_layers=2,
        conf_threshold=0.0,
    )
    return LayoutDetector(config=cfg)


def test_layout_batch_predict_shapes(tiny_layout):
    imgs = [
        np.random.randint(0, 255, (300, 220, 3), np.uint8),
        np.random.randint(0, 255, (160, 160, 3), np.uint8),
    ]
    results = tiny_layout.batch_predict(imgs)
    assert len(results) == 2
    for dets, img in zip(results, imgs):
        h, w = img.shape[:2]
        for det in dets:
            assert len(det["poly"]) == 8
            xs = det["poly"][0::2]
            ys = det["poly"][1::2]
            assert 0 <= min(xs) and max(xs) <= w
            assert 0 <= min(ys) and max(ys) <= h
            assert isinstance(det["original_order"], int)
            assert det["original_label"] in tiny_layout.labels


def test_layout_order_is_contiguous(tiny_layout):
    img = np.random.randint(0, 255, (200, 200, 3), np.uint8)
    dets = tiny_layout.batch_predict([img])[0]
    orders = [d["original_order"] for d in dets]
    assert orders == list(range(len(orders)))
