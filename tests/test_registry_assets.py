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


def _tied_const_graph(tmp_path, name, out_specs, consts, in_shape,
                      metadata=None):
    """Graph whose constant outputs are tied to the input (not folded)."""
    from rapiddoc_tpu.tools import onnx_writer as w

    nodes = [
        w.encode_node("ReduceMean", ["x"], ["m"], {"keepdims": 0}),
        w.encode_node("Mul", ["m", "zero"], ["z"]),
    ]
    inits = {"zero": np.asarray(0.0, np.float32)}
    for out_name, arr in consts.items():
        nodes.append(w.encode_node("Add", [f"{out_name}_c", "z"], [out_name]))
        inits[f"{out_name}_c"] = arr
    data = w.build_model(nodes, {"x": in_shape}, out_specs, inits)
    if metadata:
        data = w.build_model_with_metadata(data, metadata)
    p = tmp_path / name
    p.write_bytes(data)
    return p


def test_onnx_table_classifier_consensus(tmp_path):
    from rapiddoc_tpu.models.table.onnx_models import OnnxTableClassifier

    wired = np.asarray([[5.0, 0.0]], np.float32)
    wireless = np.asarray([[0.0, 5.0]], np.float32)
    p1 = _tied_const_graph(tmp_path, "paddle_cls.onnx", {"y": (1, 2)},
                           {"y": wired}, (1, 3, 224, 224))
    p2 = _tied_const_graph(tmp_path, "q_cls.onnx", {"y": (1, 2)},
                           {"y": wireless}, (1, 3, 224, 224))
    img = np.full((300, 400, 3), 255, np.uint8)
    assert OnnxTableClassifier(p1, None)([img]) == ["wired"]
    assert OnnxTableClassifier(None, p2)([img]) == ["wireless"]
    # disagreement -> wireless (reference PADDLE_Q_CLS consensus)
    assert OnnxTableClassifier(p1, p2)([img]) == ["wireless"]


def test_onnx_orientation_with_metadata_labels(tmp_path):
    from rapiddoc_tpu.models.orientation.engine import OnnxOrientationClassifier

    logits = np.zeros((1, 4), np.float32)
    logits[0, 2] = 9.0  # third label
    p = _tied_const_graph(
        tmp_path, "rapid_orientation.onnx", {"y": (1, 4)}, {"y": logits},
        (1, 3, 224, 224), metadata={"character": "0\n90\n180\n270"},
    )
    cls = OnnxOrientationClassifier(p)
    assert cls([np.full((400, 300, 3), 255, np.uint8)]) == [180]


def test_onnx_wired_table_structure(tmp_path):
    from rapiddoc_tpu.models.table.onnx_models import OnnxWiredTableStructure

    # class map with a 3x3 line lattice at 1024^2 (h=1, v=2)
    pred = np.zeros((1, 1024, 1024), np.int64)
    for y in (64, 480, 960):
        pred[0, y - 3 : y + 3, 64:960] = 1
    for x in (64, 512, 960):
        pred[0, 64:960, x - 3 : x + 3] = 2
    p = _tied_const_graph(
        tmp_path, "unet.onnx", {"y": (1, 1024, 1024)},
        {"y": pred.astype(np.float32)}, (1, 3, 1024, 1024),
    )
    wired = OnnxWiredTableStructure(p)
    cells, grid = wired.batch([np.full((512, 512, 3), 255, np.uint8)])[0]
    assert len(cells) == 4  # 2x2 lattice
    assert max(g[0] for g in grid) == 1 and max(g[1] for g in grid) == 1


def test_onnx_doclayout_yolo_contract(tmp_path):
    """DocLayout-YOLO docstructbench route: letterbox preprocess, already-
    decoded (B,N,6) [xyxy,conf,cls] output unscaled per letterbox geometry,
    class id == pipeline CategoryId except isolate_formula -> 14
    (reference rapid_layout.py:48-50,73-76 + doc_layout/post_process.py)."""
    from rapiddoc_tpu.models.layout.onnx_engine import (
        OnnxLayoutConfig,
        OnnxLayoutDetector,
    )
    from rapiddoc_tpu.tools import onnx_writer as w
    from rapiddoc_tpu.types import CategoryId

    # image 512x1024 -> gain 1.0, pad top 256, left 0
    preds = np.asarray(
        [[
            [100, 356, 300, 456, 0.9, 0],   # title at src (100,100)-(300,200)
            [400, 556, 600, 656, 0.8, 8],   # isolate_formula -> cat 14
            [0, 256, 50, 306, 0.1, 1],      # below threshold
        ]],
        np.float32,
    )
    nodes = [
        w.encode_node("ReduceMean", ["images"], ["m"], {"keepdims": 0}),
        w.encode_node("Mul", ["m", "zero"], ["z"]),
        w.encode_node("Add", ["preds_c", "z"], ["preds"]),
    ]
    data = w.build_model(
        nodes,
        {"images": (1, 3, 1024, 1024)},
        {"preds": (1, 3, 6)},
        {"preds_c": preds, "zero": np.asarray(0.0, np.float32)},
    )
    p = tmp_path / "doclayout_docstructbench.onnx"
    p.write_bytes(data)
    det = OnnxLayoutDetector(
        p,
        OnnxLayoutConfig(
            model_type="doclayout_docstructbench", conf_threshold=0.2
        ),
    )
    img = np.full((512, 1024, 3), 255, np.uint8)
    out = det.batch_predict([img])[0]
    assert [d["original_label"] for d in out] == ["title", "isolate_formula"]
    assert out[0]["category_id"] == CategoryId.Title
    assert out[1]["category_id"] == CategoryId.InterlineEquation_YOLO
    x0, y0, _, _, x1, y1, _, _ = out[0]["poly"]
    assert (round(x0), round(y0), round(x1), round(y1)) == (100, 100, 300, 200)
    assert all(d["original_order"] == -1 for d in out)


def test_layout_low_conf_model_defaults():
    """S/docstructbench default to conf 0.2 when the user sets none
    (reference rapid_layout.py:30-35)."""
    from rapiddoc_tpu.models.layout.onnx_engine import LOW_CONF_MODELS

    assert LOW_CONF_MODELS == {"pp_doclayout_s", "doclayout_docstructbench"}
