"""Layout detection engine: preprocessing, session, postprocessing.

IO contract per the reference handler (reference:
rapid_doc/model/layout/rapid_layout_self/model_handler/pp_doclayout/
main.py:17-80 — fixed 800x800 (V2/V3) or 480/640 input, /255 normalize
(V2/V3 use no mean/std), postprocess with per-class thresholds + NMS
(iou_same 0.6, iou_diff 0.98); V2/V3 det order is the reading order;
label->CategoryId maps from rapid_doc/model/layout/rapid_layout.py:131).
"""
from __future__ import annotations

from dataclasses import dataclass

import cv2
import jax
import numpy as np

from ...config import get_models_dir
from ...engine.buckets import BucketSpec
from ...engine.session import JaxSession
from ...types import CategoryId
from ...utils import boxes as B
from ...utils.logging import get_logger
from .rtdetr import RTDETR

logger = get_logger("rapiddoc_tpu.layout")

# PP-DocLayoutV2/V3 label set (alphabetical — class-id order of the model)
DOCLAYOUT_V2_LABELS = [
    "abstract", "algorithm", "aside_text", "chart", "content",
    "display_formula", "doc_title", "figure_title", "footer", "footer_image",
    "footnote", "formula_number", "header", "header_image", "image",
    "inline_formula", "number", "paragraph_title", "reference",
    "reference_content", "seal", "table", "text", "vertical_text",
    "vision_footnote",
]

DEFAULT_ABANDON_LABELS = {
    "header", "footer", "number", "aside_text", "vision_footnote",
    "header_image", "footer_image", "footnote",
}

V2_CATEGORY_MAP = {
    "abstract": CategoryId.Text,
    "algorithm": CategoryId.Text,
    "aside_text": CategoryId.Text,
    "chart": CategoryId.ImageBody,
    "content": CategoryId.Text,
    "display_formula": CategoryId.InterlineEquation_YOLO,
    "doc_title": CategoryId.Title,
    "figure_title": CategoryId.Text,
    "footer": CategoryId.Text,
    "footer_image": CategoryId.ImageBody,
    "footnote": CategoryId.Text,
    "formula_number": CategoryId.InterlineEquationNumber_Layout,
    "header": CategoryId.Text,
    "header_image": CategoryId.ImageBody,
    "image": CategoryId.ImageBody,
    "inline_formula": CategoryId.InlineEquation,
    "number": CategoryId.Text,
    "paragraph_title": CategoryId.Title,
    "reference": CategoryId.Text,
    "reference_content": CategoryId.Text,
    "seal": CategoryId.ImageBody,
    "table": CategoryId.TableBody,
    "text": CategoryId.Text,
    "vertical_text": CategoryId.Text,
    "vision_footnote": CategoryId.Text,
}


def class_nms(
    boxes: np.ndarray, scores: np.ndarray, labels: np.ndarray,
    iou_same: float = 0.6, iou_diff: float = 0.98,
) -> list[int]:
    """NMS with separate IoU thresholds for same-class and cross-class pairs
    (reference: pp_doclayout/post_process.py:948)."""
    order = np.argsort(-scores)
    keep: list[int] = []
    if len(boxes) == 0:
        return keep
    ious = B.iou_matrix(boxes, boxes)
    suppressed = np.zeros(len(boxes), dtype=bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(int(i))
        same = labels == labels[i]
        suppressed |= same & (ious[i] > iou_same)
        suppressed |= (~same) & (ious[i] > iou_diff)
        suppressed[i] = True
    return keep


@dataclass
class LayoutConfig:
    model_size: str = "B4"
    input_size: int = 800
    conf_threshold: float = 0.5
    num_queries: int = 300
    dec_layers: int = 6
    markdown_ignore_labels: frozenset = frozenset(DEFAULT_ABANDON_LABELS)
    # V3 irregular-region masks -> polygon_points on dets
    with_masks: bool = True
    # per-class confidence overrides (reference: pp_doclayout
    # post_process.py per-class threshold table); falls back to
    # conf_threshold for unlisted labels
    class_thresholds: dict | None = None


def mask_to_polygon(
    mask01: np.ndarray, src_w: float, src_h: float, max_points: int = 32
) -> list[list[float]] | None:
    """Binary instance mask (model grid) -> simplified polygon in source
    pixels (reference: pp_doclayout/post_process.py mask2polygon :400,
    extract_polygon_points_by_masks :425). None when the mask is empty or
    effectively rectangular (callers keep the plain box then)."""
    m = (mask01 > 0.5).astype(np.uint8)
    if m.sum() < 4:
        return None
    contours, _ = cv2.findContours(m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    if not contours:
        return None
    contour = max(contours, key=cv2.contourArea)
    if cv2.contourArea(contour) < 4:
        return None
    eps = 0.01 * cv2.arcLength(contour, True)
    poly = cv2.approxPolyDP(contour, eps, True).reshape(-1, 2)
    if len(poly) < 3:
        return None
    if len(poly) > max_points:
        step = len(poly) / max_points
        poly = poly[(np.arange(max_points) * step).astype(int)]
    # rectangular-enough masks carry no extra information over the bbox
    # (cv2.contourArea of a filled rect contour is (w-1)*(h-1))
    x, y, w, h = cv2.boundingRect(contour)
    if len(poly) <= 4 and cv2.contourArea(contour) > 0.9 * (w - 1) * (h - 1):
        return None
    gh, gw = m.shape
    sx, sy = src_w / gw, src_h / gh
    return [[float(px * sx), float(py * sy)] for px, py in poly]


class LayoutDetector:
    """Batched RT-DETR layout detection; output dets in image pixels."""

    def __init__(self, variables=None, config: LayoutConfig | None = None,
                 seed: int = 0):
        self.config = config or LayoutConfig()
        cfg = self.config
        self.labels = DOCLAYOUT_V2_LABELS
        self.model = RTDETR(
            num_classes=len(self.labels),
            backbone_size=cfg.model_size,
            num_queries=cfg.num_queries,
            dec_layers=cfg.dec_layers,
            with_masks=cfg.with_masks,
        )
        if variables is None:
            variables = self.model.init(
                jax.random.PRNGKey(seed),
                np.zeros((1, cfg.input_size, cfg.input_size, 3), np.float32),
            )
        spec = BucketSpec(
            heights=(cfg.input_size,), widths=(cfg.input_size,),
            batch_sizes=(1, 2, 4, 8),
        )
        import jax.numpy as jnp

        # 4-bit luma wire (default): layout geometry is achromatic and
        # the wire is the layout stage's ceiling on a tunneled chip —
        # 6x fewer bytes than RGB uint8. RAPIDDOC_LAYOUT_WIRE_BITS=8
        # restores the RGB wire (e.g. color-dependent corpora).
        import os as _os

        self.nibble_wire = (
            _os.environ.get("RAPIDDOC_LAYOUT_WIRE_BITS", "4") == "4"
        )

        def _preproc(x):
            if self.nibble_wire:
                hi = x >> 4
                lo = x & 15
                n, h, w2, _ = x.shape
                y = jnp.stack([hi, lo], axis=3).reshape(n, h, w2 * 2, 1) * 17
                x = jnp.broadcast_to(y, (n, h, w2 * 2, 3))
            return x.astype(jnp.float32) / 255.0

        self.session = JaxSession(
            lambda v, x: self.model.apply(v, x), variables, spec, name="layout",
            preproc=_preproc,
        )

    @classmethod
    def build(cls, configs: dict):
        models_dir = get_models_dir()
        from ..registry import _load_variables

        # published .onnx checkpoint -> JAX ONNX interpreter path
        from .onnx_engine import (
            LOW_CONF_MODELS,
            MODEL_SPECS,
            OnnxLayoutConfig,
            OnnxLayoutDetector,
        )

        model_type = configs.get("model_type", "pp_doclayoutv3")
        # reference callers pass a ModelType enum; accept its .value
        model_type = getattr(model_type, "value", model_type)
        for stem in ([model_type] if model_type in MODEL_SPECS else []) + list(
            MODEL_SPECS
        ):
            onnx_path = models_dir / f"{stem}.onnx"
            if onnx_path.is_file():
                logger.info("layout: published ONNX checkpoint %s", onnx_path)
                return OnnxLayoutDetector(
                    onnx_path,
                    OnnxLayoutConfig(
                        model_type=stem,
                        # S / docstructbench under-recall at 0.5; the
                        # reference auto-lowers (rapid_layout.py:30-35)
                        conf_threshold=configs.get(
                            "conf_thresh",
                            0.2 if stem in LOW_CONF_MODELS else 0.5,
                        ),
                        class_thresholds=configs.get("class_thresholds"),
                        markdown_ignore_labels=frozenset(
                            configs.get(
                                "markdown_ignore_labels",
                                DEFAULT_ABANDON_LABELS,
                            )
                        ),
                    ),
                )

        variables = _load_variables(models_dir / "layout_doclayout_v3.npz")
        demo_used = False
        if variables is None:
            # in-repo demo checkpoint trained on synthetic labeled pages
            # (rapiddoc_tpu/train/layout.py) — real layout detections
            # without network egress. Opt-in until quality on real PDFs
            # is established (RAPIDDOC_DEMO_LAYOUT=1 / configs flag).
            import json
            import os

            from ..registry import DEMO_ASSETS_DIR

            demo_on = configs.get(
                "demo_layout",
                os.environ.get("RAPIDDOC_DEMO_LAYOUT", "").lower()
                in ("1", "true", "yes"),
            )
            demo_npz = DEMO_ASSETS_DIR / "layout_demo.npz"
            demo_cfg = demo_npz.with_suffix(".json")
            if demo_on and demo_cfg.is_file():
                variables = _load_variables(demo_npz)
                if variables is not None:
                    logger.info("layout: demo synthetic-trained checkpoint")
                    arch = json.loads(demo_cfg.read_text())
                    configs = {**arch, **configs}
                    demo_used = True
        if variables is None and not configs.get("allow_random_init", False):
            # without trained weights a random detector is worse than the
            # structural fallback (native text / OCR det drive the layout)
            raise FileNotFoundError("layout checkpoint missing")
        cfg = LayoutConfig(
            model_size=configs.get("model_size", "B4"),
            input_size=configs.get("input_size", 800),
            num_queries=configs.get("num_queries", 300),
            dec_layers=configs.get("dec_layers", 6),
            conf_threshold=configs.get("conf_threshold", 0.5),
            class_thresholds=configs.get("class_thresholds"),
            with_masks=configs.get("with_masks", True),
        )
        if configs.get("markdown_ignore_labels") is not None:
            import dataclasses

            cfg = dataclasses.replace(
                cfg,
                markdown_ignore_labels=frozenset(
                    configs["markdown_ignore_labels"]
                ),
            )
        det = cls(variables, config=cfg)
        if demo_used:
            # scheduler routes txt-mode pages to the structural fallback
            # (native text beats a synthetic-trained detector there)
            det.demo_txt_fallback = True
        return det

    def batch_predict(self, images: list[np.ndarray]) -> list[list[dict]]:
        """images: uint8 RGB arrays. Returns per-image layout_dets
        ({category_id, poly, score, original_label, original_order})."""
        if not images:
            return []
        size = self.config.input_size
        resized = [
            cv2.resize(img, (size, size), interpolation=cv2.INTER_CUBIC)
            for img in images
        ]
        if self.nibble_wire:
            from ..ocr.pre_post import pack_nibbles, to_luma

            resized = [pack_nibbles(to_luma(r)) for r in resized]
        batch = np.stack(resized)  # uint8; unpack + /255 happen on device
        outs = self.session(batch)
        results = []
        for i, img in enumerate(images):
            h, w = img.shape[:2]
            masks = None
            if "masks_bits" in outs:
                # unpack the device bitmask (Nq, H/8, ceil(W/8)*8 bits)
                bits = outs["masks_bits"][i]
                # grid is square (input_size/8), so true W == grid H
                masks = np.unpackbits(bits, axis=-1)[..., : bits.shape[1]]
            results.append(
                self._postprocess(
                    outs["scores"][i], outs["labels"][i], outs["boxes"][i],
                    w, h, masks=masks,
                )
            )
        return results

    def _postprocess(self, scores, labels, boxes_cxcywh, src_w, src_h,
                     masks=None) -> list[dict]:
        cfg = self.config
        if cfg.class_thresholds:
            thresh = np.array(
                [
                    cfg.class_thresholds.get(
                        self.labels[int(l)], cfg.conf_threshold
                    )
                    for l in labels
                ]
            )
            mask = scores > thresh
        else:
            mask = scores > cfg.conf_threshold
        if not mask.any():
            return []
        scores = scores[mask]
        labels = labels[mask]
        b = boxes_cxcywh[mask]
        if masks is not None:
            masks = np.asarray(masks)[mask]
        # cxcywh [0,1] -> xyxy pixels
        xyxy = np.stack(
            [
                (b[:, 0] - b[:, 2] / 2) * src_w,
                (b[:, 1] - b[:, 3] / 2) * src_h,
                (b[:, 0] + b[:, 2] / 2) * src_w,
                (b[:, 1] + b[:, 3] / 2) * src_h,
            ],
            axis=1,
        )
        xyxy[:, 0::2] = np.clip(xyxy[:, 0::2], 0, src_w)
        xyxy[:, 1::2] = np.clip(xyxy[:, 1::2], 0, src_h)
        keep = class_nms(xyxy, scores, labels)
        dets = []
        for i in keep:
            label = self.labels[int(labels[i])]
            cat = V2_CATEGORY_MAP.get(label, CategoryId.Text)
            if label in cfg.markdown_ignore_labels:
                cat = CategoryId.Abandon
            x0, y0, x1, y1 = xyxy[i]
            det = {
                "category_id": cat,
                "poly": [x0, y0, x1, y0, x1, y1, x0, y1],
                "score": float(scores[i]),
                "original_label": label,
                # RT-DETR query order post-NMS is NOT a model-predicted
                # reading order; -1 makes page_build fall back to xycut
                # (reference emits real orders only for V2/V3 ONNX,
                # pp_doclayout/main.py:70)
                "original_order": -1,
            }
            if masks is not None:
                # sigmoid(logits) > .5 == logits > 0
                poly_pts = mask_to_polygon(
                    (masks[i] > 0).astype(np.float32), src_w, src_h
                )
                if poly_pts is not None:
                    det["polygon_points"] = poly_pts
            dets.append(det)
        return dets
