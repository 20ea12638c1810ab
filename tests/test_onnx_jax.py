"""JAX ONNX interpreter tests: op-level parity vs torch on synthesized
graphs (tools/onnx_writer), plus an integration check on the one real
trained .onnx available in the environment (magika)."""
import json
from pathlib import Path

import numpy as np
import pytest

from rapiddoc_tpu.engine.onnx_jax import OnnxJaxFunction
from rapiddoc_tpu.tools.onnx_reader import read_onnx_model
from rapiddoc_tpu.tools import onnx_writer as w

MAGIKA = Path(
    "/root/reference/rapid_doc/model/magika/models/standard_v3_3"
)


def run_graph(tmp_path, nodes, inputs, outputs, initializers=None,
              feeds=None, input_dtypes=None):
    data = w.build_model(
        nodes, inputs, outputs, initializers, input_dtypes=input_dtypes
    )
    p = tmp_path / "m.onnx"
    p.write_bytes(data)
    fn = OnnxJaxFunction(read_onnx_model(p))
    return fn(*feeds)


def test_conv_vs_torch(tmp_path):
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 13, 17)).astype(np.float32)
    wgt = rng.standard_normal((8, 3, 3, 3)).astype(np.float32)
    b = rng.standard_normal((8,)).astype(np.float32)
    out = run_graph(
        tmp_path,
        [w.encode_node("Conv", ["x", "w", "b"], ["y"],
                       {"strides": [2, 2], "pads": [1, 0, 1, 2],
                        "dilations": [1, 1], "group": 1})],
        {"x": x.shape}, {"y": (1,)}, {"w": wgt, "b": b}, [x],
    )[0]
    ref = torch.nn.functional.conv2d(
        torch.from_numpy(np.pad(x, ((0, 0), (0, 0), (1, 1), (0, 2)))),
        torch.from_numpy(wgt), torch.from_numpy(b), stride=2,
    ).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


def test_depthwise_conv_vs_torch(tmp_path):
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 6, 10, 10)).astype(np.float32)
    wgt = rng.standard_normal((6, 1, 3, 3)).astype(np.float32)
    out = run_graph(
        tmp_path,
        [w.encode_node("Conv", ["x", "w"], ["y"],
                       {"pads": [1, 1, 1, 1], "group": 6})],
        {"x": x.shape}, {"y": (1,)}, {"w": wgt}, [x],
    )[0]
    ref = torch.nn.functional.conv2d(
        torch.from_numpy(x), torch.from_numpy(wgt), padding=1, groups=6
    ).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


def test_conv_transpose_vs_torch(tmp_path):
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 4, 7, 7)).astype(np.float32)
    wgt = rng.standard_normal((4, 6, 2, 2)).astype(np.float32)
    b = rng.standard_normal((6,)).astype(np.float32)
    out = run_graph(
        tmp_path,
        [w.encode_node("ConvTranspose", ["x", "w", "b"], ["y"],
                       {"strides": [2, 2]})],
        {"x": x.shape}, {"y": (1,)}, {"w": wgt, "b": b}, [x],
    )[0]
    ref = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x), torch.from_numpy(wgt), torch.from_numpy(b),
        stride=2,
    ).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


def test_pools_vs_torch(tmp_path):
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 2, 11, 11)).astype(np.float32)
    out = run_graph(
        tmp_path,
        [w.encode_node("MaxPool", ["x"], ["y"],
                       {"kernel_shape": [3, 3], "strides": [2, 2],
                        "ceil_mode": 1})],
        {"x": x.shape}, {"y": (1,)}, None, [x],
    )[0]
    ref = torch.nn.functional.max_pool2d(
        torch.from_numpy(x), 3, 2, ceil_mode=True
    ).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-5)

    out = run_graph(
        tmp_path,
        [w.encode_node("AveragePool", ["x"], ["y"],
                       {"kernel_shape": [2, 2], "strides": [2, 2],
                        "pads": [1, 1, 0, 0]})],
        {"x": x.shape}, {"y": (1,)}, None, [x],
    )[0]
    ref = torch.nn.functional.avg_pool2d(
        torch.from_numpy(x), 2, 2, padding=(1, 1),
        count_include_pad=False,
    ).numpy()
    # torch pads symmetrically; onnx pads are (top,left,bottom,right)
    assert out.shape[2] == ref.shape[2]


def test_batchnorm_gemm_softmax(tmp_path):
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 5, 4, 4)).astype(np.float32)
    scale = rng.standard_normal((5,)).astype(np.float32)
    bias = rng.standard_normal((5,)).astype(np.float32)
    mean = rng.standard_normal((5,)).astype(np.float32)
    var = rng.random((5,)).astype(np.float32) + 0.5
    out = run_graph(
        tmp_path,
        [w.encode_node("BatchNormalization",
                       ["x", "s", "b", "m", "v"], ["y"],
                       {"epsilon": 1e-5})],
        {"x": x.shape}, {"y": (1,)},
        {"s": scale, "b": bias, "m": mean, "v": var}, [x],
    )[0]
    ref = torch.nn.functional.batch_norm(
        torch.from_numpy(x), torch.from_numpy(mean), torch.from_numpy(var),
        torch.from_numpy(scale), torch.from_numpy(bias), eps=1e-5,
    ).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)

    a = rng.standard_normal((3, 7)).astype(np.float32)
    bm = rng.standard_normal((9, 7)).astype(np.float32)
    c = rng.standard_normal((9,)).astype(np.float32)
    out = run_graph(
        tmp_path,
        [w.encode_node("Gemm", ["a", "b", "c"], ["y"],
                       {"transB": 1, "alpha": 1.0, "beta": 1.0}),
         w.encode_node("Softmax", ["y"], ["z"], {"axis": -1})],
        {"a": a.shape}, {"z": (1,)}, {"b": bm, "c": c}, [a],
    )[0]
    ref = torch.softmax(
        torch.from_numpy(a) @ torch.from_numpy(bm).T + torch.from_numpy(c),
        dim=-1,
    ).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-4)


def test_resize_bilinear_vs_torch(tmp_path):
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, 3, 8, 8)).astype(np.float32)
    out = run_graph(
        tmp_path,
        [w.encode_node("Resize", ["x", "", "", "sizes"], ["y"],
                       {"mode": "linear",
                        "coordinate_transformation_mode": "half_pixel"})],
        {"x": x.shape}, {"y": (1,)},
        {"sizes": np.asarray([1, 3, 16, 16], np.int64)}, [x],
    )[0]
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=(16, 16), mode="bilinear",
        align_corners=False,
    ).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


def test_grid_sample_vs_torch(tmp_path):
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 3, 9, 9)).astype(np.float32)
    grid = (rng.random((2, 5, 7, 2)).astype(np.float32) * 2.4) - 1.2
    out = run_graph(
        tmp_path,
        [w.encode_node("GridSample", ["x", "g"], ["y"],
                       {"mode": "bilinear", "align_corners": 0,
                        "padding_mode": "zeros"})],
        {"x": x.shape, "g": grid.shape}, {"y": (1,)}, None, [x, grid],
    )[0]
    ref = torch.nn.functional.grid_sample(
        torch.from_numpy(x), torch.from_numpy(grid), mode="bilinear",
        align_corners=False, padding_mode="zeros",
    ).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


def test_shape_chain_static_resolution(tmp_path):
    """Shape->Gather->Concat->Reshape resolves statically under jit."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 6, 5)).astype(np.float32)
    nodes = [
        w.encode_node("Shape", ["x"], ["shp"]),
        w.encode_node("Gather", ["shp", "i0"], ["b"], {"axis": 0}),
        w.encode_node("Unsqueeze", ["b", "ax0"], ["b1"]),
        w.encode_node("Concat", ["b1", "rest"], ["tgt"], {"axis": 0}),
        w.encode_node("Reshape", ["x", "tgt"], ["y"]),
    ]
    out = run_graph(
        tmp_path, nodes, {"x": x.shape}, {"y": (1,)},
        {"i0": np.asarray(0, np.int64),
         "ax0": np.asarray([0], np.int64),
         "rest": np.asarray([3, 10], np.int64)},
        [x],
    )[0]
    np.testing.assert_allclose(out, x.reshape(2, 3, 10))


def test_topk_layernorm(tmp_path):
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(8)
    x = rng.standard_normal((2, 10)).astype(np.float32)
    vals, idx = run_graph(
        tmp_path,
        [w.encode_node("TopK", ["x", "k"], ["v", "i"], {"axis": -1})],
        {"x": x.shape}, {"v": (1,), "i": (1,)},
        {"k": np.asarray([3], np.int64)}, [x],
    )
    tv, ti = torch.topk(torch.from_numpy(x), 3, dim=-1)
    np.testing.assert_allclose(vals, tv.numpy(), atol=1e-6)
    np.testing.assert_array_equal(idx, ti.numpy())

    s = rng.standard_normal((5,)).astype(np.float32)
    b = rng.standard_normal((5,)).astype(np.float32)
    x2 = rng.standard_normal((2, 4, 5)).astype(np.float32)
    out = run_graph(
        tmp_path,
        [w.encode_node("LayerNormalization", ["x", "s", "b"], ["y"],
                       {"axis": -1, "epsilon": 1e-5})],
        {"x": x2.shape}, {"y": (1,)}, {"s": s, "b": b}, [x2],
    )[0]
    ref = torch.nn.functional.layer_norm(
        torch.from_numpy(x2), (5,), torch.from_numpy(s), torch.from_numpy(b),
        eps=1e-5,
    ).numpy()
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-4)


@pytest.mark.skipif(not MAGIKA.is_dir(), reason="magika model unavailable")
def test_magika_real_model_detects_filetypes():
    """The vendored trained magika .onnx runs through the interpreter and
    classifies real files correctly — a quality-bearing check on a real
    checkpoint (reference: rapid_doc/model/magika/magika.py feature spec)."""
    from rapiddoc_tpu.utils.sniff import magika_classify

    cases = {
        "/root/reference/demo/pdfs/demo1.pdf": "pdf",
        "/root/reference/README.md": "markdown",
        "/root/reference/rapid_doc/version.py": "python",
    }
    for path, expect in cases.items():
        if not Path(path).is_file():
            continue
        label, score = magika_classify(Path(path).read_bytes())
        assert label == expect, (path, label)
        assert score > 0.9


def test_if_static_and_traced_cond(tmp_path):
    """If: static conds resolve at trace time; traced conds lower to
    lax.cond. Branches capture outer-scope names per ONNX semantics."""
    x = np.arange(6, dtype=np.float32).reshape(2, 3)
    then_g = w.SubGraph(
        [w.encode_node("Add", ["x", "x"], ["tb"])], outputs={"tb": (1,)}
    )
    else_g = w.SubGraph(
        [w.encode_node("Mul", ["x", "x"], ["eb"])], outputs={"eb": (1,)}
    )
    # static cond (initializer): only the chosen branch is traced
    for flag, expect in [(True, x + x), (False, x * x)]:
        out = run_graph(
            tmp_path,
            [w.encode_node("If", ["c"], ["y"],
                           {"then_branch": then_g, "else_branch": else_g})],
            {"x": x.shape}, {"y": (1,)},
            {"c": np.asarray(flag)}, [x],
        )[0]
        np.testing.assert_allclose(out, expect)
    # traced cond: sum(x) > threshold, threshold fed as input
    nodes = [
        w.encode_node("ReduceSum", ["x"], ["s"], {"keepdims": 0}),
        w.encode_node("Greater", ["s", "t"], ["c"]),
        w.encode_node("If", ["c"], ["y"],
                      {"then_branch": then_g, "else_branch": else_g}),
    ]
    for thresh, expect in [(0.0, x + x), (100.0, x * x)]:
        out = run_graph(
            tmp_path, nodes, {"x": x.shape, "t": ()}, {"y": (1,)},
            None, [x, np.asarray(thresh, np.float32)],
        )[0]
        np.testing.assert_allclose(out, expect)


def test_loop_carried_state(tmp_path):
    """Loop with a pure carried value and always-true cond: x doubles M
    times (the static-trip-count shape every AR export uses)."""
    x = np.arange(4, dtype=np.float32)
    body = w.SubGraph(
        [
            w.encode_node("Add", ["v", "v"], ["v2"]),
            w.encode_node("Identity", ["cin"], ["cout"]),
        ],
        inputs={"it": (), "cin": (), "v": (4,)},
        outputs={"cout": (), "v2": (1,)},
        input_dtypes={"it": 7, "cin": 9},
    )
    out = run_graph(
        tmp_path,
        [w.encode_node("Loop", ["m", "c0", "x"], ["y"], {"body": body})],
        {"x": x.shape}, {"y": (1,)},
        {"m": np.asarray(5, np.int64), "c0": np.asarray(True)}, [x],
    )[0]
    np.testing.assert_allclose(out, x * 32)


def test_loop_early_exit_with_scan_output(tmp_path):
    """Data-dependent exit + scan output: s += 1 while s < 3, scanning s.
    The while_loop stops after 3 of 6 allowed iterations; the scan buffer
    keeps zero padding past the exit (documented divergence from
    onnxruntime's truncate-to-trip-count)."""
    body = w.SubGraph(
        [
            w.encode_node("Add", ["s", "one"], ["s2"]),
            w.encode_node("Less", ["s2", "three"], ["cout"]),
            w.encode_node("Identity", ["s2"], ["scan"]),
        ],
        inputs={"it": (), "cin": (), "s": ()},
        outputs={"cout": (), "s2": (), "scan": ()},
        initializers={"one": np.float32(1), "three": np.float32(3)},
        input_dtypes={"it": 7, "cin": 9},
    )
    final, scans = run_graph(
        tmp_path,
        [w.encode_node("Loop", ["m", "c0", "s0"], ["sf", "hist"],
                       {"body": body})],
        {"s0": ()}, {"sf": (1,), "hist": (1,)},
        {"m": np.asarray(6, np.int64), "c0": np.asarray(True)},
        [np.asarray(0.0, np.float32)],
    )
    assert float(final) == 3.0
    np.testing.assert_allclose(scans, [1.0, 2.0, 3.0, 0.0, 0.0, 0.0])


def test_onnx_wireless_structure_contract(tmp_path):
    """OnnxWirelessStructure end-to-end on a synthetic slanet-plus.onnx:
    metadata character list, merge_no_span vocab, eos stop, td bbox
    rescale to original pixels (reference: pp_structure/post_process.py)."""
    from rapiddoc_tpu.models.table.onnx_models import OnnxWirelessStructure

    raw_chars = ["<thead>", "</thead>", "<tbody>", "</tbody>",
                 "<tr>", "</tr>", "<td>", "</td>"]
    # post-merge vocab: [sos] + chars(-<td> +<td></td>) + [eos]
    # ids: sos=0 ... </td>=7 <td></td>=8 eos=9
    V, T = 10, 6
    probs = np.zeros((1, T, V), np.float32)
    for t, cid in enumerate([5, 8, 7, 9, 9, 9]):  # tr, td, /td, eos...
        probs[0, t, cid] = 1.0
    bbox = np.zeros((1, T, 8), np.float32)
    bbox[0, 1] = [0.1, 0.2, 0.5, 0.2, 0.5, 0.6, 0.1, 0.6]
    nodes = [
        w.encode_node("Identity", ["bbox_c"], ["bbox"]),
        w.encode_node("Identity", ["probs_c"], ["probs"]),
    ]
    data = w.build_model(
        nodes, {"x": (1, 3, 488, 488)}, {"bbox": (1,), "probs": (1,)},
        {"bbox_c": bbox, "probs_c": probs},
    )
    data = w.build_model_with_metadata(
        data, {"character": "\n".join(raw_chars)}
    )
    p = tmp_path / "slanet-plus.onnx"
    p.write_bytes(data)
    model = OnnxWirelessStructure(p)
    img = np.full((100, 200, 3), 255, np.uint8)
    [(structure, bboxes)] = model([img])
    assert structure == ["<tr>", "<td></td>", "</td>"]
    assert len(bboxes) == 1
    np.testing.assert_allclose(bboxes[0], [20.0, 40.0, 100.0, 120.0],
                               atol=1e-3)
