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


def test_layout_order_not_claimed_by_flax_path(tiny_layout):
    """RT-DETR post-NMS score order is not a model-predicted reading
    order; the flax path must emit -1 so page_build falls back to xycut
    (reference emits native orders only for the V2/V3 ONNX,
    pp_doclayout/main.py:70)."""
    img = np.random.randint(0, 255, (200, 200, 3), np.uint8)
    dets = tiny_layout.batch_predict([img])[0]
    assert all(d["original_order"] == -1 for d in dets)


def test_mask_to_polygon_l_shape():
    from rapiddoc_tpu.models.layout.engine import mask_to_polygon

    m = np.zeros((50, 50), np.float32)
    m[5:45, 5:25] = 1.0   # vertical bar
    m[30:45, 5:45] = 1.0  # horizontal foot -> L shape
    poly = mask_to_polygon(m, 400.0, 400.0)
    assert poly is not None and len(poly) >= 5
    xs = [p[0] for p in poly]
    ys = [p[1] for p in poly]
    assert max(xs) <= 400 and max(ys) <= 400


def test_mask_to_polygon_rectangle_is_none():
    from rapiddoc_tpu.models.layout.engine import mask_to_polygon

    m = np.zeros((50, 50), np.float32)
    m[10:40, 10:40] = 1.0
    assert mask_to_polygon(m, 400.0, 400.0) is None
    assert mask_to_polygon(np.zeros((50, 50), np.float32), 400, 400) is None


def test_layout_masks_output(tiny_layout):
    if not tiny_layout.config.with_masks:
        return
    imgs = [np.random.randint(0, 255, (200, 200, 3), np.uint8)]
    dets = tiny_layout.batch_predict(imgs)[0]
    # polygon_points, when present, must lie inside the image
    for d in dets:
        for x, y in d.get("polygon_points") or []:
            assert 0 <= x <= 200 and 0 <= y <= 200


def test_per_class_thresholds(tiny_layout):
    import copy

    from rapiddoc_tpu.models.layout.engine import LayoutConfig

    scores = np.array([0.6, 0.6, 0.95])
    labels = np.array([0, 1, 1])
    boxes = np.array(  # disjoint boxes so NMS keeps all survivors
        [[0.2, 0.2, 0.1, 0.1], [0.5, 0.5, 0.1, 0.1], [0.8, 0.8, 0.1, 0.1]],
        np.float32,
    )
    cfg = LayoutConfig(conf_threshold=0.5,
                       class_thresholds={"algorithm": 0.9})
    det = copy.copy(tiny_layout)
    det.config = cfg
    # label index 1 == "algorithm" in the alphabetical label list
    assert det.labels[1] == "algorithm"
    out = det._postprocess(scores, labels, boxes, 100, 100)
    kept = {(d["original_label"], round(d["score"], 2)) for d in out}
    assert ("abstract", 0.6) in kept       # default threshold applies
    assert ("algorithm", 0.95) in kept     # above per-class 0.9
    assert ("algorithm", 0.6) not in kept  # below per-class 0.9
