"""Registry/converter consistency + the ONNX layout-detector contract."""
import numpy as np


def test_every_registry_converter_exists():
    """No dangling converter names (the round-1 'unitable' drift class)."""
    from rapiddoc_tpu.models.download import REGISTRY
    from rapiddoc_tpu.tools.convert_weights import CONVERTERS

    for key, asset in REGISTRY.items():
        if asset.converter is not None:
            assert asset.converter in CONVERTERS, (key, asset.converter)
        else:
            assert asset.name.endswith(".onnx"), key  # run via onnx_jax


def test_registry_pins_published_hashes():
    """Every asset whose reference registry publishes a SHA256 is pinned."""
    from rapiddoc_tpu.models.download import REGISTRY

    pinned = [k for k, a in REGISTRY.items() if a.sha256]
    # layout x8 + table x7 + formula pth
    assert len(pinned) >= 15
    for k in pinned:
        assert len(REGISTRY[k].sha256) == 64, k


def test_onnx_layout_detector_contract(tmp_path):
    """OnnxLayoutDetector drives a synthetic graph with the published IO
    contract (image/scale_factor in; boxes(N,6)/box_nums(B)/masks out) and
    emits layout dets with native order + mask polygons."""
    from rapiddoc_tpu.models.layout.onnx_engine import (
        OnnxLayoutConfig,
        OnnxLayoutDetector,
    )
    from rapiddoc_tpu.tools import onnx_writer as w

    # two dets: a doc_title (class 6) and a table (class 21), V2/V3 label set
    boxes = np.asarray(
        [
            [6, 0.9, 10, 10, 200, 40],
            [21, 0.8, 10, 60, 200, 180],
            [22, 0.1, 0, 0, 5, 5],  # text below threshold
        ],
        np.float32,
    )
    box_nums = np.asarray([3], np.int32)
    masks = np.zeros((3, 50, 50), np.float32)
    masks[1, 15:45, 2:48] = 1.0  # rectangular-ish -> may simplify away
    nodes = [
        # tie outputs to the input so the graph isn't constant-only
        w.encode_node("ReduceMean", ["image"], ["m"], {"keepdims": 0}),
        w.encode_node("Mul", ["m", "zero"], ["z"]),
        w.encode_node("Add", ["boxes_c", "z"], ["boxes"]),
        w.encode_node("Add", ["masks_c", "z"], ["masks"]),
        w.encode_node("Identity", ["nums_c"], ["box_nums"]),
    ]
    data = w.build_model(
        nodes,
        {"image": (1, 3, 800, 800), "scale_factor": (1, 2)},
        {"boxes": (3, 6), "box_nums": (1,), "masks": (3, 50, 50)},
        {
            "boxes_c": boxes,
            "masks_c": masks,
            "nums_c": box_nums,
            "zero": np.asarray(0.0, np.float32),
        },
    )
    p = tmp_path / "layout.onnx"
    p.write_bytes(data)

    det = OnnxLayoutDetector(p, OnnxLayoutConfig(model_type="pp_doclayoutv3"))
    img = np.full((400, 300, 3), 255, np.uint8)
    out = det.batch_predict([img])[0]
    labels = [d["original_label"] for d in out]
    assert labels == ["doc_title", "table"]
    assert [d["original_order"] for d in out] == [0, 1]
    from rapiddoc_tpu.types import CategoryId

    assert out[0]["category_id"] == CategoryId.Title
    assert out[1]["category_id"] == CategoryId.TableBody
    # poly clipped to image bounds
    assert max(out[1]["poly"][0::2]) <= 300


def test_onnx_layout_sml_inline_formula(tmp_path):
    """S/M/L label set routes formulas, and contained formulas become
    inline (reference rapid_layout.py:110-128)."""
    from rapiddoc_tpu.models.layout.onnx_engine import (
        OnnxLayoutConfig,
        OnnxLayoutDetector,
    )
    from rapiddoc_tpu.tools import onnx_writer as w
    from rapiddoc_tpu.types import CategoryId

    # S/M/L label set: 11=formula, 22=text. The reference's is_contained
    # is a strict IoU>=0.9 (boxbase.calculate_iou), i.e. the formula det
    # nearly coincides with a text det.
    boxes = np.asarray(
        [
            [22, 0.9, 10, 10, 290, 60],   # text
            [11, 0.9, 11, 11, 289, 59],   # formula ~= the text det
        ],
        np.float32,
    )
    nodes = [
        w.encode_node("ReduceMean", ["image"], ["m"], {"keepdims": 0}),
        w.encode_node("Mul", ["m", "zero"], ["z"]),
        w.encode_node("Add", ["boxes_c", "z"], ["boxes"]),
        w.encode_node("Identity", ["nums_c"], ["box_nums"]),
    ]
    data = w.build_model(
        nodes,
        {"image": (1, 3, 480, 480), "scale_factor": (1, 2)},
        {"boxes": (2, 6), "box_nums": (1,)},
        {
            "boxes_c": boxes,
            "nums_c": np.asarray([2], np.int32),
            "zero": np.asarray(0.0, np.float32),
        },
    )
    p = tmp_path / "layout_s.onnx"
    p.write_bytes(data)
    det = OnnxLayoutDetector(p, OnnxLayoutConfig(model_type="pp_doclayout_s"))
    out = det.batch_predict([np.full((480, 480, 3), 255, np.uint8)])[0]
    by_label = {d["original_label"]: d for d in out}
    assert by_label["formula"]["category_id"] == CategoryId.InlineEquation
    assert all(d["original_order"] == -1 for d in out)
