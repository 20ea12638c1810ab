"""Family-level ONNX interpreter tests: synthesized graphs replicating the
published models' IO contracts and op mixes (reference:
rapid_doc/model/layout/rapid_layout_self/inference_engine/onnxruntime/
main.py:61-78 — the graphs the real checkpoints will bring), round-tripped
through engine/onnx_jax.py against independent numpy evaluators.

Four families, per the published registry:
- RT-DETR layout (PP-DocLayout/V3): image + im_shape/scale_factor inputs,
  transformer block, NMS-free TopK decode, cxcywh->xyxy rescale, optional
  mask head behind If (V3);
- FormulaNet-style AR decoder: Loop with embedding Gather, attention over
  encoder memory, ArgMax step, EOS early-exit, scan-output token stream;
- UNET wired table: conv/pool encoder, Resize upsample, skip Concat,
  channel Softmax;
- SLANet-style GRU-attention step decoder: Loop carrying a hidden state,
  per-step attention + token/bbox emission as twin scan outputs.

Every ONNX weight is also applied by a pure-numpy evaluator below — the
expectation is computed independently, nothing is read back from the
interpreter.
"""
from __future__ import annotations

import numpy as np
import pytest

from rapiddoc_tpu.engine.onnx_jax import OnnxJaxFunction
from rapiddoc_tpu.tools import onnx_writer as w
from rapiddoc_tpu.tools.onnx_reader import read_onnx_model

INT64 = 7
BOOL = 9


def build_fn(tmp_path, nodes, inputs, outputs, initializers=None,
             input_dtypes=None):
    data = w.build_model(
        nodes, inputs, outputs, initializers, input_dtypes=input_dtypes
    )
    p = tmp_path / "m.onnx"
    p.write_bytes(data)
    return OnnxJaxFunction(read_onnx_model(p))


# ------------------------------------------------------- numpy primitives

def np_conv(x, wgt, b, stride):
    """NCHW VALID conv, numpy loops (tiny shapes only)."""
    n, ci, h, wd = x.shape
    co, _, kh, kw = wgt.shape
    oh = (h - kh) // stride + 1
    ow = (wd - kw) // stride + 1
    out = np.zeros((n, co, oh, ow), np.float32)
    for i in range(oh):
        for j in range(ow):
            patch = x[:, :, i * stride : i * stride + kh,
                      j * stride : j * stride + kw]
            out[:, :, i, j] = np.einsum("nchw,ochw->no", patch, wgt)
    return out + b[None, :, None, None]


def np_softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def np_layernorm(x, scale, bias, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * scale + bias


def _erf(x):
    # Abramowitz–Stegun 7.1.26, enough for 1e-5 agreement on test ranges
    import math

    v = np.vectorize(math.erf)
    return v(x).astype(np.float32)


def np_gelu_exact(x):
    return 0.5 * x * (1.0 + _erf(x / np.sqrt(2.0).astype(np.float32)))


def np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


# ------------------------------------------------------------ 1. RT-DETR

def test_rtdetr_family_graph(tmp_path):
    """RT-DETR layout contract: (image, im_shape, scale_factor) ->
    NMS-free TopK boxes [label, score, xyxy in original pixels] + If-gated
    mask head (the PP-DocLayoutV3 shape)."""
    rng = np.random.default_rng(0)
    H = W = 32
    D, NQ, NC, K = 8, 64, 3, 10
    img = rng.standard_normal((1, 3, H, W)).astype(np.float32)
    im_shape = np.asarray([[H, W]], np.float32)
    scale_factor = np.asarray([[0.5, 0.5]], np.float32)

    stem_w = (rng.standard_normal((D, 3, 4, 4)) * 0.3).astype(np.float32)
    stem_b = rng.standard_normal((D,)).astype(np.float32)
    ln1_s = rng.standard_normal((D,)).astype(np.float32)
    ln1_b = rng.standard_normal((D,)).astype(np.float32)
    w_qkv = (rng.standard_normal((D, D)) * 0.4).astype(np.float32)
    ln2_s = rng.standard_normal((D,)).astype(np.float32)
    ln2_b = rng.standard_normal((D,)).astype(np.float32)
    w_ff1 = (rng.standard_normal((D, 2 * D)) * 0.4).astype(np.float32)
    w_ff2 = (rng.standard_normal((2 * D, D)) * 0.4).astype(np.float32)
    w_score = (rng.standard_normal((D, NC)) * 0.5).astype(np.float32)
    w_box = (rng.standard_normal((D, 4)) * 0.5).astype(np.float32)
    mask_w = (rng.standard_normal((1, D, 1, 1)) * 0.5).astype(np.float32)
    mask_b = np.zeros((1,), np.float32)

    half = np.asarray([0.5], np.float32)
    then_g = w.SubGraph(
        [
            w.encode_node("Conv", ["feat", "mask_w", "mask_b"], ["m0"],
                          {"strides": [1, 1], "pads": [0, 0, 0, 0],
                           "dilations": [1, 1], "group": 1}),
            w.encode_node("Resize", ["m0", "", "mask_scales"], ["m1"],
                          {"mode": "nearest"}),
            w.encode_node("Sigmoid", ["m1"], ["masks_t"]),
        ],
        outputs={"masks_t": (1,)},
    )
    else_g = w.SubGraph(
        [
            w.encode_node("Conv", ["feat", "mask_w", "mask_b"], ["z0"],
                          {"strides": [1, 1], "pads": [0, 0, 0, 0],
                           "dilations": [1, 1], "group": 1}),
            w.encode_node("Resize", ["z0", "", "mask_scales"], ["z1"],
                          {"mode": "nearest"}),
            w.encode_node("Mul", ["z1", "zero_f"], ["masks_e"]),
        ],
        outputs={"masks_e": (1,)},
    )

    nodes = [
        # stem: stride-4 VALID conv -> (1, D, 8, 8) -> tokens (1, 64, D)
        w.encode_node("Conv", ["image", "stem_w", "stem_b"], ["feat"],
                      {"strides": [4, 4], "pads": [0, 0, 0, 0],
                       "dilations": [1, 1], "group": 1}),
        w.encode_node("Reshape", ["feat", "tok_shape"], ["tok0"]),
        w.encode_node("Transpose", ["tok0", ], ["tok"],
                      {"perm": [0, 2, 1]}),
        # pre-norm self-attention (q = k = v = x @ w_qkv)
        w.encode_node("LayerNormalization", ["tok", "ln1_s", "ln1_b"],
                      ["ln1"], {"axis": -1, "epsilon": 1e-5}),
        w.encode_node("MatMul", ["ln1", "w_qkv"], ["q"]),
        w.encode_node("Transpose", ["q"], ["qT"], {"perm": [0, 2, 1]}),
        w.encode_node("MatMul", ["q", "qT"], ["att0"]),
        w.encode_node("Mul", ["att0", "inv_sqrt_d"], ["att1"]),
        w.encode_node("Softmax", ["att1"], ["att"], {"axis": -1}),
        w.encode_node("MatMul", ["att", "q"], ["attn_out"]),
        w.encode_node("Add", ["tok", "attn_out"], ["x1"]),
        # pre-norm ffn with exact gelu
        w.encode_node("LayerNormalization", ["x1", "ln2_s", "ln2_b"],
                      ["ln2"], {"axis": -1, "epsilon": 1e-5}),
        w.encode_node("MatMul", ["ln2", "w_ff1"], ["ff0"]),
        w.encode_node("Gelu", ["ff0"], ["ff1"]),
        w.encode_node("MatMul", ["ff1", "w_ff2"], ["ff2"]),
        w.encode_node("Add", ["x1", "ff2"], ["x2"]),
        # heads
        w.encode_node("MatMul", ["x2", "w_score"], ["logits"]),
        w.encode_node("Sigmoid", ["logits"], ["probs"]),
        w.encode_node("MatMul", ["x2", "w_box"], ["box_raw"]),
        w.encode_node("Sigmoid", ["box_raw"], ["box_n"]),
        # NMS-free: best class per query, TopK over queries
        w.encode_node("ReduceMax", ["probs"], ["qscore"],
                      {"axes": [-1], "keepdims": 0}),
        w.encode_node("ArgMax", ["probs"], ["qlabel"],
                      {"axis": -1, "keepdims": 0}),
        w.encode_node("TopK", ["qscore", "k_const"], ["top_s", "top_i"],
                      {"axis": -1, "largest": 1, "sorted": 1}),
        w.encode_node("Gather", ["box_n", "top_i"], ["top_box_b"],
                      {"axis": 1}),
        w.encode_node("Reshape", ["top_box_b", "box_k_shape"], ["top_box"]),
        w.encode_node("Gather", ["qlabel", "top_i"], ["top_l_b"],
                      {"axis": 1}),
        # cxcywh (normalized) -> xyxy in original pixels:
        # orig = im_shape / scale_factor
        w.encode_node("Div", ["im_shape", "scale_factor"], ["orig_hw"]),
        w.encode_node("Split", ["top_box"], ["cx", "cy", "bw", "bh"],
                      {"axis": -1, "num_outputs": 4}),
        w.encode_node("Mul", ["bw", "half"], ["bw2"]),
        w.encode_node("Mul", ["bh", "half"], ["bh2"]),
        w.encode_node("Sub", ["cx", "bw2"], ["x0n"]),
        w.encode_node("Sub", ["cy", "bh2"], ["y0n"]),
        w.encode_node("Add", ["cx", "bw2"], ["x1n"]),
        w.encode_node("Add", ["cy", "bh2"], ["y1n"]),
        w.encode_node("Concat", ["x0n", "y0n", "x1n", "y1n"], ["xyxy_n"],
                      {"axis": -1}),
        # scale x by orig W, y by orig H (w,h order per axis)
        w.encode_node("Split", ["orig_hw", ], ["oh", "ow"],
                      {"axis": -1, "num_outputs": 2}),
        w.encode_node("Concat", ["ow", "oh", "ow", "oh"], ["whwh"],
                      {"axis": -1}),
        w.encode_node("Mul", ["xyxy_n", "whwh"], ["xyxy"]),
        # [label, score, x0, y0, x1, y1]
        w.encode_node("Cast", ["top_l_b", ], ["top_l_f"], {"to": 1}),
        w.encode_node("Reshape", ["top_l_f", "col_shape"], ["lab_col"]),
        w.encode_node("Reshape", ["top_s", "col_shape"], ["s_col"]),
        w.encode_node("Concat", ["lab_col", "s_col", "xyxy"], ["dets"],
                      {"axis": -1}),
        # V3 mask branch, gated on a runtime bool input
        w.encode_node("If", ["use_mask"], ["masks"],
                      {"then_branch": then_g, "else_branch": else_g}),
    ]
    inits = {
        "stem_w": stem_w, "stem_b": stem_b,
        "ln1_s": ln1_s, "ln1_b": ln1_b, "w_qkv": w_qkv,
        "ln2_s": ln2_s, "ln2_b": ln2_b, "w_ff1": w_ff1, "w_ff2": w_ff2,
        "w_score": w_score, "w_box": w_box,
        "mask_w": mask_w, "mask_b": mask_b,
        "tok_shape": np.asarray([1, D, NQ], np.int64),
        "inv_sqrt_d": np.asarray(1.0 / np.sqrt(D), np.float32),
        "k_const": np.asarray([K], np.int64),
        "half": half,
        "box_k_shape": np.asarray([K, 4], np.int64),
        "col_shape": np.asarray([K, 1], np.int64),
        "mask_scales": np.asarray([1, 1, 4, 4], np.float32),
        "zero_f": np.asarray(0.0, np.float32),
    }
    fn = build_fn(
        tmp_path, nodes,
        {"image": img.shape, "im_shape": (1, 2), "scale_factor": (1, 2),
         "use_mask": ()},
        {"dets": (1,), "masks": (1,)},
        inits,
        input_dtypes={"use_mask": BOOL},
    )

    for use_mask in (True, False):
        dets, masks = fn(img, im_shape, scale_factor, np.asarray(use_mask))
        dets, masks = np.asarray(dets), np.asarray(masks)

        # ------------------------ independent numpy evaluation
        feat = np_conv(img, stem_w, stem_b, 4)
        tok = feat.reshape(1, D, NQ).transpose(0, 2, 1)
        ln1 = np_layernorm(tok, ln1_s, ln1_b)
        q = ln1 @ w_qkv
        att = np_softmax(q @ q.transpose(0, 2, 1) / np.sqrt(D))
        x1 = tok + att @ q
        ln2 = np_layernorm(x1, ln2_s, ln2_b)
        x2 = x1 + np_gelu_exact(ln2 @ w_ff1) @ w_ff2
        probs = np_sigmoid(x2 @ w_score)
        box_n = np_sigmoid(x2 @ w_box)
        qscore = probs.max(-1)[0]
        qlabel = probs.argmax(-1)[0]
        top_i = np.argsort(-qscore, kind="stable")[:K]
        ow_, oh_ = W / 0.5, H / 0.5
        cx, cy, bw, bh = box_n[0, top_i].T
        xyxy = np.stack(
            [(cx - bw / 2) * ow_, (cy - bh / 2) * oh_,
             (cx + bw / 2) * ow_, (cy + bh / 2) * oh_], axis=-1
        )
        exp_dets = np.concatenate(
            [qlabel[top_i, None].astype(np.float32),
             qscore[top_i, None], xyxy], axis=-1,
        )
        m = np_conv(feat, mask_w, mask_b, 1)
        m = np.kron(m, np.ones((1, 1, 4, 4), np.float32))
        exp_masks = np_sigmoid(m) if use_mask else m * 0.0

        np.testing.assert_allclose(dets, exp_dets, atol=2e-4, rtol=2e-4)
        np.testing.assert_allclose(masks, exp_masks, atol=2e-4, rtol=2e-4)


# ------------------------------------------------- 2. AR decoder (Loop)

def _ar_weights(seed):
    rng = np.random.default_rng(seed)
    V, D, S = 12, 8, 5
    emb = rng.standard_normal((V, D)).astype(np.float32)
    w_q = rng.standard_normal((D, D)).astype(np.float32)
    mem = rng.standard_normal((S, D)).astype(np.float32)
    w_out = rng.standard_normal((D, V)).astype(np.float32)
    return V, D, S, emb, w_q, mem, w_out


def _np_ar_decode(seed, bos, eos, max_steps):
    V, D, S, emb, w_q, mem, w_out = _ar_weights(seed)
    toks, cur = [], bos
    for _ in range(max_steps):
        e = emb[cur][None]
        attn = np_softmax((e @ w_q) @ mem.T)
        logits = (attn @ mem) @ w_out
        cur = int(logits[0].argmax())
        toks.append(cur)
        if cur == eos:
            break
    return toks


@pytest.mark.parametrize("seed", [3, 7, 11])
def test_formula_ar_loop_graph(tmp_path, seed):
    """FormulaNet-export shape: greedy AR decode as a Loop whose body does
    embedding Gather -> attention over fixed encoder memory -> ArgMax,
    with EOS early-exit and the token stream as a scan output."""
    V, D, S, emb, w_q, mem, w_out = _ar_weights(seed)
    BOS, EOS, M = 0, 1, 9

    body = w.SubGraph(
        [
            w.encode_node("Gather", ["emb", "cur"], ["e"], {"axis": 0}),
            w.encode_node("MatMul", ["e", "w_q"], ["q"]),
            w.encode_node("MatMul", ["q", "memT"], ["scores"]),
            w.encode_node("Softmax", ["scores"], ["alpha"], {"axis": -1}),
            w.encode_node("MatMul", ["alpha", "mem"], ["ctx"]),
            w.encode_node("MatMul", ["ctx", "w_out"], ["logits"]),
            w.encode_node("ArgMax", ["logits"], ["nxt"],
                          {"axis": -1, "keepdims": 0}),
            w.encode_node("Equal", ["nxt", "eos"], ["is_eos"]),
            w.encode_node("Not", ["is_eos"], ["cout"]),
            w.encode_node("Identity", ["nxt"], ["scan_tok"]),
        ],
        inputs={"it": (), "cin": (), "cur": ()},
        outputs={"cout": (), "nxt": (), "scan_tok": ()},
        initializers={
            "emb": emb, "w_q": w_q, "mem": mem,
            "memT": np.ascontiguousarray(mem.T), "w_out": w_out,
            "eos": np.asarray(EOS, np.int64),
            "ax0": np.asarray([0], np.int64),
        },
        input_dtypes={"it": INT64, "cin": BOOL, "cur": INT64},
    )
    fn = build_fn(
        tmp_path,
        [w.encode_node("Loop", ["m", "c0", "bos"], ["last", "toks"],
                       {"body": body})],
        {"bos": ()}, {"last": (1,), "toks": (1,)},
        {"m": np.asarray(M, np.int64), "c0": np.asarray(True)},
        input_dtypes={"bos": INT64},
    )
    last, toks = fn(np.asarray(BOS, np.int64))
    toks = np.asarray(toks)

    expect = _np_ar_decode(seed, BOS, EOS, M)
    got = toks[: len(expect)].tolist()
    assert got == expect, (got, expect)
    assert int(np.asarray(last)) == expect[-1]
    # past early exit the scan buffer keeps padding (documented
    # divergence from onnxruntime's truncation)
    assert np.all(toks[len(expect):] == 0)


# ------------------------------------------------------------- 3. UNET

def test_unet_family_graph(tmp_path):
    """UNET wired-table shape: conv->pool encoder, nearest Resize
    upsample, skip Concat, 1x1 head, channel Softmax."""
    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, 3, 16, 16)).astype(np.float32)
    w1 = (rng.standard_normal((4, 3, 3, 3)) * 0.4).astype(np.float32)
    b1 = rng.standard_normal((4,)).astype(np.float32)
    w2 = (rng.standard_normal((8, 4, 3, 3)) * 0.4).astype(np.float32)
    b2 = rng.standard_normal((8,)).astype(np.float32)
    w3 = (rng.standard_normal((2, 12, 1, 1)) * 0.4).astype(np.float32)
    b3 = rng.standard_normal((2,)).astype(np.float32)

    nodes = [
        w.encode_node("Conv", ["x", "w1", "b1"], ["c1"],
                      {"strides": [1, 1], "pads": [1, 1, 1, 1],
                       "dilations": [1, 1], "group": 1}),
        w.encode_node("Relu", ["c1"], ["r1"]),
        w.encode_node("MaxPool", ["r1"], ["p1"],
                      {"kernel_shape": [2, 2], "strides": [2, 2],
                       "pads": [0, 0, 0, 0]}),
        w.encode_node("Conv", ["p1", "w2", "b2"], ["c2"],
                      {"strides": [1, 1], "pads": [1, 1, 1, 1],
                       "dilations": [1, 1], "group": 1}),
        w.encode_node("Relu", ["c2"], ["r2"]),
        w.encode_node("Resize", ["r2", "", "up_scales"], ["u2"],
                      {"mode": "nearest"}),
        w.encode_node("Concat", ["r1", "u2"], ["cat"], {"axis": 1}),
        w.encode_node("Conv", ["cat", "w3", "b3"], ["head"],
                      {"strides": [1, 1], "pads": [0, 0, 0, 0],
                       "dilations": [1, 1], "group": 1}),
        w.encode_node("Softmax", ["head"], ["prob"], {"axis": 1}),
    ]
    fn = build_fn(
        tmp_path, nodes, {"x": x.shape}, {"prob": (1,)},
        {"w1": w1, "b1": b1, "w2": w2, "b2": b2, "w3": w3, "b3": b3,
         "up_scales": np.asarray([1, 1, 2, 2], np.float32)},
    )
    (prob,) = fn(x)
    prob = np.asarray(prob)

    xp = np.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    r1 = np.maximum(np_conv(xp, w1, b1, 1), 0)
    p1 = r1.reshape(1, 4, 8, 2, 8, 2).max(axis=(3, 5))
    p1p = np.pad(p1, ((0, 0), (0, 0), (1, 1), (1, 1)))
    r2 = np.maximum(np_conv(p1p, w2, b2, 1), 0)
    u2 = np.kron(r2, np.ones((1, 1, 2, 2), np.float32))
    cat = np.concatenate([r1, u2], axis=1)
    head = np_conv(cat, w3, b3, 1)
    exp = np_softmax(head, axis=1)
    np.testing.assert_allclose(prob, exp, atol=2e-4, rtol=2e-4)


# ---------------------------------------- 4. SLANet GRU-attention (Loop)

def _sla_weights(seed):
    rng = np.random.default_rng(seed)
    S, C, Hd, V = 6, 4, 8, 10
    fea = rng.standard_normal((S, C)).astype(np.float32)
    w_k = rng.standard_normal((C, Hd)).astype(np.float32)
    w_h = rng.standard_normal((Hd, Hd)).astype(np.float32)
    v_a = rng.standard_normal((Hd, 1)).astype(np.float32)
    emb = rng.standard_normal((V, Hd)).astype(np.float32)
    w_x = rng.standard_normal((C + Hd, Hd)).astype(np.float32)
    w_hh = rng.standard_normal((Hd, Hd)).astype(np.float32)
    w_o = rng.standard_normal((Hd, V)).astype(np.float32)
    w_b = rng.standard_normal((Hd, 8)).astype(np.float32)
    return S, C, Hd, V, fea, w_k, w_h, v_a, emb, w_x, w_hh, w_o, w_b


def _np_sla_decode(seed, sos, eos, max_steps):
    S, C, Hd, V, fea, w_k, w_h, v_a, emb, w_x, w_hh, w_o, w_b = (
        _sla_weights(seed)
    )
    h = np.zeros((1, Hd), np.float32)
    cur = sos
    toks, boxes = [], []
    for _ in range(max_steps):
        score = np.tanh(fea @ w_k + h @ w_h) @ v_a  # (S, 1)
        alpha = np_softmax(score, axis=0)
        ctx = (alpha * fea).sum(0, keepdims=True)  # (1, C)
        e = emb[cur][None]
        xcat = np.concatenate([ctx, e], axis=-1)
        h = np.tanh(xcat @ w_x + h @ w_hh)
        logits = h @ w_o
        box = np_sigmoid(h @ w_b)
        cur = int(logits[0].argmax())
        toks.append(cur)
        boxes.append(box[0])
        if cur == eos:
            break
    return toks, np.stack(boxes)


@pytest.mark.parametrize("seed", [2, 9])
def test_slanet_family_loop_graph(tmp_path, seed):
    """SLANet-export shape: a Loop carrying (hidden, token) whose body does
    additive attention over the CNN feature map and emits one structure
    token + one 8-coord box per step (twin scan outputs)."""
    S, C, Hd, V, fea, w_k, w_h, v_a, emb, w_x, w_hh, w_o, w_b = (
        _sla_weights(seed)
    )
    SOS, EOS, M = 0, 1, 8

    body = w.SubGraph(
        [
            w.encode_node("MatMul", ["fea", "w_k"], ["fk"]),
            w.encode_node("MatMul", ["h", "w_h"], ["hk"]),
            w.encode_node("Add", ["fk", "hk"], ["pre"]),
            w.encode_node("Tanh", ["pre"], ["t"]),
            w.encode_node("MatMul", ["t", "v_a"], ["score"]),
            w.encode_node("Softmax", ["score"], ["alpha"], {"axis": 0}),
            w.encode_node("Mul", ["alpha", "fea"], ["weighted"]),
            w.encode_node("ReduceSum", ["weighted"], ["ctx"],
                          {"axes": [0], "keepdims": 1}),
            w.encode_node("Gather", ["emb", "cur"], ["e0"], {"axis": 0}),
            w.encode_node("Unsqueeze", ["e0", "ax0"], ["e"]),
            w.encode_node("Concat", ["ctx", "e"], ["xcat"], {"axis": -1}),
            w.encode_node("MatMul", ["xcat", "w_x"], ["xp"]),
            w.encode_node("MatMul", ["h", "w_hh"], ["hp"]),
            w.encode_node("Add", ["xp", "hp"], ["hpre"]),
            w.encode_node("Tanh", ["hpre"], ["h2"]),
            w.encode_node("MatMul", ["h2", "w_o"], ["logits"]),
            w.encode_node("MatMul", ["h2", "w_b"], ["braw"]),
            w.encode_node("Sigmoid", ["braw"], ["box2"]),
            w.encode_node("ArgMax", ["logits"], ["nxt0"],
                          {"axis": -1, "keepdims": 0}),
            w.encode_node("Squeeze", ["nxt0", "ax0"], ["nxt"]),
            w.encode_node("Equal", ["nxt", "eos"], ["is_eos"]),
            w.encode_node("Not", ["is_eos"], ["cout"]),
            w.encode_node("Identity", ["nxt"], ["scan_tok"]),
            w.encode_node("Squeeze", ["box2", "ax0"], ["scan_box"]),
        ],
        inputs={"it": (), "cin": (), "h": (1, Hd), "cur": ()},
        outputs={"cout": (), "h2": (1,), "nxt": (), "scan_tok": (),
                 "scan_box": (1,)},
        initializers={
            "fea": fea, "w_k": w_k, "w_h": w_h, "v_a": v_a, "emb": emb,
            "w_x": w_x, "w_hh": w_hh, "w_o": w_o, "w_b": w_b,
            "eos": np.asarray(EOS, np.int64),
            "ax0": np.asarray([0], np.int64),
        },
        input_dtypes={"it": INT64, "cin": BOOL, "cur": INT64},
    )
    fn = build_fn(
        tmp_path,
        [w.encode_node("Loop", ["m", "c0", "h0", "sos"],
                       ["hf", "tok_last", "toks", "boxes"],
                       {"body": body})],
        {"h0": (1, Hd), "sos": ()}, {"hf": (1,), "tok_last": (1,),
                                     "toks": (1,), "boxes": (1,)},
        {"m": np.asarray(M, np.int64), "c0": np.asarray(True)},
        input_dtypes={"sos": INT64},
    )
    hf, tok_last, toks, boxes = fn(
        np.zeros((1, Hd), np.float32), np.asarray(SOS, np.int64)
    )
    toks, boxes = np.asarray(toks), np.asarray(boxes)

    exp_toks, exp_boxes = _np_sla_decode(seed, SOS, EOS, M)
    got = toks[: len(exp_toks)].tolist()
    assert got == exp_toks, (got, exp_toks)
    np.testing.assert_allclose(
        boxes[: len(exp_toks)], exp_boxes, atol=2e-4, rtol=2e-4
    )
