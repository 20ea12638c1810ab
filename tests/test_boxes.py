import numpy as np

from rapiddoc_tpu.utils import boxes


def test_iou_identical():
    b = [0, 0, 10, 10]
    assert boxes.iou(b, b) == 1.0


def test_iou_disjoint():
    assert boxes.iou([0, 0, 1, 1], [2, 2, 3, 3]) == 0.0


def test_iou_half():
    assert abs(boxes.iou([0, 0, 10, 10], [0, 0, 10, 5]) - 0.5) < 1e-9


def test_overlap_ratio():
    assert boxes.overlap_ratio([0, 0, 4, 4], [0, 0, 2, 4]) == 0.5


def test_iou_matrix_matches_scalar():
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 50, (6, 2))
    a = np.concatenate([a, a + rng.uniform(1, 30, (6, 2))], axis=1)
    b = rng.uniform(0, 50, (5, 2))
    b = np.concatenate([b, b + rng.uniform(1, 30, (5, 2))], axis=1)
    mat = boxes.iou_matrix(a, b)
    for i in range(6):
        for j in range(5):
            assert abs(mat[i, j] - boxes.iou(a[i], b[j])) < 1e-9


def test_nms_suppresses():
    bxs = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], dtype=float)
    scores = np.array([0.9, 0.8, 0.7])
    keep = boxes.nms(bxs, scores, iou_threshold=0.5)
    assert keep == [0, 2]


def test_merge_all_and_quad_roundtrip():
    merged = boxes.merge_all([[0, 0, 5, 5], [3, -2, 9, 4]])
    assert merged == [0, -2, 9, 5]
    quad = boxes.box_to_quad([1, 2, 3, 4])
    assert boxes.quad_to_box(quad) == [1, 2, 3, 4]


def test_edge_distance():
    assert boxes.edge_distance([0, 0, 1, 1], [4, 0, 5, 1]) == 3.0
    assert boxes.edge_distance([0, 0, 2, 2], [1, 1, 3, 3]) == 0.0
