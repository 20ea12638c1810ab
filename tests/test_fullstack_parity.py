"""Full-stack oracle parity: repo engines vs reference torch nets.

Net-level parity (test_parity_ocr / test_parity_formula) leaves the
pre/post + converter + engine seam untested — the last stretch of the
real-checkpoint path that CAN be tested without egress. Here the
reference's importable torch networks run as a complete oracle ENGINE
behind the repo's OWN pre/post: same crops in, boxes compared after DB
postprocess, text token-for-token after CTC decode, formula token ids
vs a torch greedy decode (reference: rapid_doc/model/ocr/torch.py:31-80
builds exactly these nets from arch_config.yaml; formula head
rec_ppformulanet_head.py:633 wraps an HF-MBart-layout decoder).

Weights are shared (torch init -> converted), slightly amplified at the
output heads so probabilities saturate away from decision thresholds —
a random-init net near threshold would make box/argmax comparisons
flake on fp rounding, which is not the seam under test.
"""
import math
import random

import numpy as np
import pytest

import refnets

torch = pytest.importorskip("torch")

if not refnets.available():  # pragma: no cover
    pytest.skip("reference networks unavailable", allow_module_level=True)


@pytest.fixture(autouse=True)
def _fp32_params(monkeypatch):
    """fp32 weight storage on both sides: the seam under test is
    pre/post + converter + engine plumbing, not bf16 rounding."""
    monkeypatch.setenv("RAPIDDOC_FP32_PARAMS", "1")


def _quad_iou(a: np.ndarray, b: np.ndarray) -> float:
    """Axis-aligned IoU of two quads' bounding rects (quads here are
    near-rectangular; rect IoU is tight enough for matching)."""
    ax0, ay0 = a[:, 0].min(), a[:, 1].min()
    ax1, ay1 = a[:, 0].max(), a[:, 1].max()
    bx0, by0 = b[:, 0].min(), b[:, 1].min()
    bx1, by1 = b[:, 0].max(), b[:, 1].max()
    iw = max(0.0, min(ax1, bx1) - max(ax0, bx0))
    ih = max(0.0, min(ay1, by1) - max(ay0, by0))
    inter = iw * ih
    union = (ax1 - ax0) * (ay1 - ay0) + (bx1 - bx0) * (by1 - by0) - inter
    return inter / max(union, 1e-9)


# --------------------------------------------------------------- det


def test_det_fullstack_box_parity():
    """Repo TextDetector (uint8 in -> luma transfer -> bucket pad ->
    device normalize -> DBNet -> packed-bits + 2x-pooled readback ->
    db_postprocess) == a clean oracle: the SAME trained weights applied
    full-res fp32 on host with host-side normalize and the same
    postprocess — box-for-box.

    The oracle uses the repo's own DBNet apply because a random-init
    torch net yields salt-and-pepper probability maps (no boxes — a
    vacuous comparison); the torch<->flax net equivalence itself is
    covered element-wise by test_parity_ocr. This test closes the
    remaining ENGINE seam: resize, luma wire format, bucket padding,
    device-side normalize, bit-packing/2x-pooling readback compression.
    """
    import jax
    import jax.numpy as jnp
    import pytest as _pytest

    from rapiddoc_tpu.models.ocr.engine import TextDetector
    from rapiddoc_tpu.models.ocr.pre_post import (
        IMAGENET_MEAN,
        IMAGENET_STD,
        DBPostParams,
        db_postprocess,
        det_resize,
        to_luma,
    )
    from rapiddoc_tpu.models.registry import DEMO_ASSETS_DIR, _load_variables
    from rapiddoc_tpu.train.synth import render_page

    variables = _load_variables(DEMO_ASSETS_DIR / "ocr_det_demo.npz")
    if variables is None:
        _pytest.skip("trained demo det checkpoint unavailable")
    variables = jax.tree.map(
        lambda a: np.asarray(a, np.float32), variables
    )
    page = render_page(random.Random(3), 640)[0]
    detector = TextDetector(variables, limit_side_len=640)
    res = detector._detect([page])[0]

    # oracle: same weights, full-res fp32 on host, same pre/post —
    # no session, no luma wire, no packed readback
    resized, _, _ = det_resize(page, 640, "max")
    rh, rw = resized.shape[:2]
    luma = to_luma(resized).astype(np.float32)
    x = np.repeat(luma / 255.0, 3, axis=-1)
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    prob = np.asarray(
        detector.model.apply(variables, jnp.asarray(x[None]))
    )[0, ..., 0]
    oracle_boxes, _scores = db_postprocess(
        np.clip(prob, 0.0, 1.0), page.shape[0], page.shape[1],
        valid_h=rh, valid_w=rw, params=DBPostParams(),
    )

    assert len(oracle_boxes) >= 5  # trained det must see real text lines
    assert abs(len(res.boxes) - len(oracle_boxes)) <= 1, (
        len(res.boxes), len(oracle_boxes),
    )
    used = set()
    matched = 0
    for box in res.boxes:
        best, best_iou = None, 0.0
        for k, ob in enumerate(oracle_boxes):
            if k in used:
                continue
            iou = _quad_iou(np.asarray(box), np.asarray(ob))
            if iou > best_iou:
                best, best_iou = k, iou
        if best is not None and best_iou > 0.85:
            used.add(best)
            matched += 1
    assert matched >= min(len(res.boxes), len(oracle_boxes)) - 1, (
        matched, len(res.boxes), len(oracle_boxes),
    )


# --------------------------------------------------------------- rec


def _torch_rec(n_classes: int):
    m = refnets.load("backbones.rec_lcnetv4")
    headm = refnets.load("heads.rec_multi_head")
    torch.manual_seed(1)

    class Rec(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = m.PPLCNetV4(det=False, model_size="small")
            self.head = headm.MultiHead(
                in_channels=384,
                out_channels_list={"CTCLabelDecode": n_classes},
                head_list=[
                    {
                        "CTCHead": {
                            "Neck": {
                                "name": "lightsvtr",
                                "dims": 120,
                                "depth": 2,
                                "mlp_ratio": 2.0,
                                "local_kernel": 7,
                            },
                            "Head": {"fc_decay": 1e-5},
                        }
                    },
                    {"NRTRHead": {"nrtr_dim": 384, "max_text_length": 25}},
                ],
            )

        def forward(self, x):
            out = self.head(self.backbone(x))
            return out["ctc_logits"] if isinstance(out, dict) else out

    rec = Rec().eval()
    # spread the logits so per-frame argmax is tie-free
    with torch.no_grad():
        for name, p in rec.head.named_parameters():
            if "ctc_head.fc" in name and p.dim() == 2:
                p *= 4.0
    return rec


def test_rec_fullstack_text_parity():
    """Repo TextRecognizer (width-bucketed uint8 -> luma -> device
    normalize -> SVTR/CTC -> CTCLabelDecoder) == torch net behind the
    same resize/normalize/decode, token-for-token."""
    from rapiddoc_tpu.models.ocr.engine import TextRecognizer
    from rapiddoc_tpu.models.ocr.pre_post import (
        rec_resize,
        rec_width_bucket,
        to_luma,
    )
    from rapiddoc_tpu.train.synth import random_text, render_line

    charset = [chr(33 + i) for i in range(199)]  # 199 chars + blank + space
    n_classes = len(charset) + 2
    rec = _torch_rec(n_classes)
    recognizer = TextRecognizer.from_torch_state(
        rec.state_dict(), charset=charset + [" "], num_classes=n_classes
    )

    rng = random.Random(5)
    crops = [
        np.asarray(render_line(random_text(rng), rng)) for _ in range(6)
    ]
    results = recognizer(crops)

    widths = recognizer.session.bucket_spec.widths
    mismatches = 0
    for crop, got in zip(crops, results):
        wb = rec_width_bucket(crop.shape[1], crop.shape[0], widths)
        batch = rec_resize(crop, wb)
        luma = to_luma(batch).astype(np.float32)
        x = np.repeat(luma / 127.5 - 1.0, 3, axis=-1)
        with torch.no_grad():
            logits = rec(
                torch.from_numpy(x.transpose(2, 0, 1)[None]).float()
            )[0].numpy()  # (T, C)
        probs = np.exp(logits - logits.max(-1, keepdims=True))
        probs = probs / probs.sum(-1, keepdims=True)
        ids = logits.argmax(-1)
        valid_t = max(1, int(math.ceil(
            min(wb, crop.shape[1] * 48 / max(crop.shape[0], 1)) / 8
        )))
        text, _score = recognizer.decoder(
            ids, probs[np.arange(len(ids)), ids], valid_t=valid_t
        )
        if got.text != text:
            mismatches += 1
    # fp32 XLA vs torch can still flip a rare near-tie frame
    assert mismatches <= 1, mismatches


# ------------------------------------------------------------- formula


VOCAB, DM, LAYERS, HEADS, FFN = 211, 64, 2, 4, 128
MAXLEN = 48


def _hf_decoder():
    from transformers import MBartConfig as HFConfig
    from transformers import MBartForCausalLM

    torch.manual_seed(0)
    cfg = HFConfig(
        vocab_size=VOCAB, d_model=DM, decoder_layers=LAYERS,
        decoder_attention_heads=HEADS, decoder_ffn_dim=FFN,
        max_position_embeddings=MAXLEN,
        activation_function="gelu", dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, is_decoder=True, is_encoder_decoder=False,
        add_cross_attention=True, add_final_layer_norm=True,
        scale_embedding=True, tie_word_embeddings=False,
        pad_token_id=1, bos_token_id=0, eos_token_id=2,
    )
    model = MBartForCausalLM(cfg).eval()
    with torch.no_grad():
        model.lm_head.weight *= 4.0  # tie-free argmax
    return model


@pytest.mark.slow
def test_formula_fullstack_token_parity():
    """Repo FormulaRecognizer.batch_predict (crop-margin, bucket canvas,
    UniMERNet normalize, B6 encoder, cached greedy while_loop) ==
    torch oracle (same preprocess -> torch B6+proj -> HF MBart greedy),
    token-for-token."""
    import cv2

    transformers = pytest.importorskip("transformers")  # noqa: F841

    from rapiddoc_tpu.models.formula.convert import formula_variables_from_torch
    from rapiddoc_tpu.models.formula.engine import (
        UNIMER_MEAN,
        UNIMER_STD,
        FormulaConfig,
        FormulaRecognizer,
        preprocess_formula,
    )

    bb = refnets.load_formula("backbones.rec_pphgnetv2")
    torch.manual_seed(0)
    enc = bb.PPHGNetV2_B6_Formula(class_num=VOCAB).eval()
    proj = torch.nn.Linear(2048, DM)
    hf = _hf_decoder()

    sd = {f"backbone.{k}": v for k, v in enc.state_dict().items()}
    sd["head.enc_to_dec_proj.weight"] = proj.weight
    sd["head.enc_to_dec_proj.bias"] = proj.bias
    for k, v in hf.state_dict().items():
        sd[f"head.decoder.{k}"] = v

    variables = formula_variables_from_torch(sd, layers=LAYERS)
    cfg = FormulaConfig(
        max_len=MAXLEN, vocab_size=VOCAB, layers=LAYERS, d_model=DM,
        ffn=FFN, heads=HEADS, default_length_bucket=MAXLEN,
    )
    recog = FormulaRecognizer(variables, config=cfg)

    crops = []
    for i in range(2):
        crop = np.full((64 + 16 * i, 288, 3), 255, np.uint8)
        cv2.putText(crop, f"E=mc{i}", (8, 40), cv2.FONT_HERSHEY_SIMPLEX,
                    1.0, (0, 0, 0), 2)
        crops.append(crop)
    got = recog.batch_predict(crops, length_bucket=MAXLEN, return_ids=True)

    for crop, ids in zip(crops, got):
        canvas, _bucket = preprocess_formula(crop)
        x = (canvas.astype(np.float32) / 255.0 - UNIMER_MEAN) / UNIMER_STD
        x = np.repeat(x, 3, axis=-1)
        with torch.no_grad():
            feats = enc(
                torch.from_numpy(x.transpose(2, 0, 1)[None]).float()
            ).last_hidden_state
            memory = proj(feats)
            cur = torch.zeros((1, 1), dtype=torch.long)  # BOS=0
            oracle_ids: list[int] = []
            for _ in range(MAXLEN):
                out = hf(input_ids=cur, encoder_hidden_states=memory)
                nxt = int(out.logits[0, -1].argmax())
                if nxt == 2:  # EOS
                    break
                oracle_ids.append(nxt)
                cur = torch.cat(
                    [cur, torch.tensor([[nxt]], dtype=torch.long)], dim=1
                )
        assert list(ids) == oracle_ids, (list(ids), oracle_ids)
