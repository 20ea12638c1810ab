"""Table recognition engine: cls -> wired(UNet)/wireless(UNITABLE) -> HTML.

Composite-strategy parity with the reference (reference:
rapid_doc/model/table/rapid_table.py:46-285 — classifier routes each table
crop to the wired or wireless structure model; OCR fills cell text; the
matcher emits final HTML).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ...config import get_models_dir
from ...utils.logging import get_logger
from .cls import TableClassifier, heuristic_table_kind
from .matcher import build_html_from_grid, html_from_structure_tokens, match_ocr_to_cells
from .slanet import SLANetStructure
from .unet import WiredTableStructure
from .unitable import UniTableStructure

logger = get_logger("rapiddoc_tpu.table")

# Composite strategies (reference: rapid_doc/model/table/rapid_table.py:46-96
# — UNET_SLANET_PLUS default, UNET_UNITABLE, plus single-model modes). The
# first element is the wired model ("unet" or None), the second the wireless
# model ("slanet" / "unitable" or None).
STRATEGIES = {
    "unet_slanet_plus": ("unet", "slanet"),
    "unet_unitable": ("unet", "unitable"),
    "slanet_plus": (None, "slanet"),
    "unitable": (None, "unitable"),
    "unet": ("unet", None),
}


@dataclass
class TableConfig:
    strategy: str = "unet_slanet_plus"
    use_cls_model: bool = False  # heuristic until trained cls weights exist
    wireless_max_len: int = 256
    use_img2table: bool = True  # OpenCV ruling-line fallback for wired
    # run BOTH structure models and arbitrate (reference:
    # rapid_table.py use_compare_table + select_best_table_model)
    use_compare_table: bool = False
    # rotate portrait crops whose text is vertical before recognition
    detect_rotation: bool = True
    # focused per-cell OCR retry on blank wired cells (reference:
    # rapid_table.py:36,99 enable_blank_cell_rec, default off)
    enable_blank_cell_rec: bool = False


class TableRecognizer:
    def __init__(self, config: TableConfig | None = None, ocr_system=None,
                 variables: dict | None = None):
        self.config = config or TableConfig()
        if self.config.strategy not in STRATEGIES:
            raise ValueError(
                f"unknown table strategy {self.config.strategy!r}; "
                f"one of {sorted(STRATEGIES)}"
            )
        wired_kind, wireless_kind = STRATEGIES[self.config.strategy]
        variables = variables or {}
        self.classifier = (
            TableClassifier(variables.get("cls"))
            if self.config.use_cls_model
            else None
        )
        self.wired = (
            WiredTableStructure(variables.get("unet"))
            if wired_kind == "unet" else None
        )
        if wireless_kind == "unitable":
            self.wireless = UniTableStructure(variables.get("unitable"))
        elif wireless_kind == "slanet":
            self.wireless = SLANetStructure(variables.get("slanet"))
        else:
            self.wireless = None
        self.ocr = ocr_system

    @classmethod
    def build(cls, configs: dict) -> "TableRecognizer":
        from ..registry import _load_variables

        models_dir = get_models_dir()
        variables = {
            "unet": _load_variables(models_dir / "table_unet.npz"),
            "unitable": _load_variables(models_dir / "table_unitable.npz"),
            "slanet": _load_variables(models_dir / "table_slanet.npz"),
            "cls": _load_variables(models_dir / "table_cls.npz"),
        }
        # in-repo demo checkpoints trained on synthetic tables
        # (rapiddoc_tpu/train/table.py) — real structure output without
        # network egress; converted published checkpoints take priority
        from ..registry import DEMO_ASSETS_DIR

        for key in ("unet", "slanet", "cls", "unitable"):
            if variables[key] is None:
                demo = _load_variables(
                    DEMO_ASSETS_DIR / f"table_{key}_demo.npz"
                )
                if demo is not None:
                    logger.info("table %s: demo synthetic-trained "
                                "checkpoint", key)
                    variables[key] = demo
        # published ONNX checkpoints run via the JAX ONNX interpreter
        unet_onnx = models_dir / "unet.onnx"
        paddle_cls = models_dir / "paddle_cls.onnx"
        q_cls = models_dir / "q_cls.onnx"
        slanet_onnx = models_dir / "slanet-plus.onnx"
        has_onnx = any(
            p.is_file() for p in (unet_onnx, paddle_cls, q_cls, slanet_onnx)
        )
        if (
            all(v is None for v in variables.values())
            and not has_onnx
            and not configs.get("allow_random_init", False)
        ):
            raise FileNotFoundError("table checkpoints missing")
        rec = cls(
            TableConfig(
                strategy=configs.get("strategy", "unet_slanet_plus"),
                use_cls_model=variables["cls"] is not None,
                wireless_max_len=configs.get("wireless_max_len", 256),
                use_img2table=configs.get("use_img2table", True),
                use_compare_table=configs.get("use_compare_table", False),
                detect_rotation=configs.get("detect_rotation", True),
                enable_blank_cell_rec=configs.get(
                    "enable_blank_cell_rec", False
                ),
            ),
            variables=variables,
        )
        from .onnx_models import (
            OnnxTableClassifier,
            OnnxWiredTableStructure,
            OnnxWirelessStructure,
        )

        if variables["unet"] is None and unet_onnx.is_file():
            logger.info("table: published unet.onnx via onnx_jax")
            rec.wired = OnnxWiredTableStructure(unet_onnx)
        strategy = configs.get("strategy", "unet_slanet_plus")
        if (
            variables["slanet"] is None
            and slanet_onnx.is_file()
            and STRATEGIES.get(strategy, (None, None))[1] == "slanet"
        ):
            logger.info("table: published slanet-plus.onnx via onnx_jax")
            rec.wireless = OnnxWirelessStructure(slanet_onnx)
        if variables["cls"] is None and (
            paddle_cls.is_file() or q_cls.is_file()
        ):
            logger.info("table: published cls .onnx via onnx_jax")
            rec.classifier = OnnxTableClassifier(
                paddle_cls if paddle_cls.is_file() else None,
                q_cls if q_cls.is_file() else None,
            )
        return rec

    def batch_predict(
        self, crops: list[np.ndarray],
        mfd_items: list[list[tuple[list[float], str]]] | None = None,
        fill_items: list[list[tuple[list[float], str]]] | None = None,
    ) -> list[str]:
        """Table crops -> HTML strings. `mfd_items[i]` carries recognized
        formulas inside crop i as (bbox-in-crop, latex); they join the
        OCR items for cell assignment (reference: rapid_table.py:180-213
        in-table formula injection). `fill_items[i]` carries in-table
        images as (bbox-in-crop, uuid placeholder): the region is whited
        out before recognition and the uuid lands in its cell, resolved
        to an <img> tag at save time (reference: rapid_table.py:180-196
        fill_image_res)."""
        if not crops:
            return []
        self._mfd = mfd_items or [[] for _ in crops]
        self._fill = fill_items or [[] for _ in crops]
        if any(self._fill):
            crops = list(crops)
            for i, fills in enumerate(self._fill):
                if not fills:
                    continue
                crop = crops[i].copy()
                h, w = crop.shape[:2]
                for bbox, _uid in fills:
                    x0, y0 = max(int(bbox[0]), 0), max(int(bbox[1]), 0)
                    x1, y1 = min(int(bbox[2]) + 1, w), min(int(bbox[3]) + 1, h)
                    if x1 > x0 and y1 > y0:
                        crop[y0:y1, x0:x1] = 255
                crops[i] = crop
        if self.config.detect_rotation and self.ocr is not None:
            from .select import detect_table_rotations

            detector = getattr(self.ocr, "detector", None)
            rotate = detect_table_rotations(crops, detector)
            crops = [
                np.ascontiguousarray(np.rot90(c, 3)) if r else c
                for c, r in zip(crops, rotate)
            ]
        if self.wired is None:
            kinds = ["wireless"] * len(crops)
        elif self.wireless is None:
            kinds = ["wired"] * len(crops)
        elif self.classifier is not None:
            kinds = self.classifier(crops)
        else:
            kinds = [heuristic_table_kind(c) for c in crops]
        results = [""] * len(crops)
        wired_idx = [i for i, k in enumerate(kinds) if k == "wired"]
        wireless_idx = [i for i, k in enumerate(kinds) if k == "wireless"]
        compare = (
            self.config.use_compare_table
            and self.wired is not None
            and self.wireless is not None
        )
        if compare:
            wired_idx = list(range(len(crops)))
            wireless_idx = list(range(len(crops)))
        # ONE batched OCR pass over every table crop: the per-table
        # _cell_texts call previously ran det+rec per crop, paying a
        # device roundtrip per table (~40 ms/table on a tunneled chip
        # for 1-crop det batches); TextSystem batches det and rec
        # across all tables at once here
        # LOCAL cache (not instance state): batch() is a public API and
        # instance-level caching would leak every table's OCR output
        # past the call and race under concurrent callers
        ocr_cache: dict[int, list] = {}
        if self.ocr is not None and crops:
            need = sorted(set(wired_idx) | set(wireless_idx))
            try:
                try:
                    outs = self.ocr(
                        [crops[i] for i in need], return_word_boxes=True
                    )
                except TypeError:  # custom OCR without word boxes
                    outs = self.ocr([crops[i] for i in need])
                ocr_cache = dict(zip(need, outs))
            except Exception:
                logger.exception("batched table OCR failed; per-table "
                                 "fallback")
                ocr_cache = {}
        if wired_idx:
            wired_structs = self.wired.batch([crops[i] for i in wired_idx])
            for i, (cell_boxes, grid) in zip(wired_idx, wired_structs):
                results[i] = self._finish_wired(
                    crops[i], cell_boxes, grid, self._mfd[i],
                    self._fill[i], ocr_out=ocr_cache.get(i),
                )
        if wireless_idx:
            structures = self.wireless(
                [crops[i] for i in wireless_idx],
                max_len=self.config.wireless_max_len,
            )
            for i, (structure, bboxes) in zip(wireless_idx, structures):
                wireless_html = self._fill_text(
                    crops[i], structure, bboxes, self._mfd[i],
                    self._fill[i], ocr_out=ocr_cache.get(i),
                )
                if compare and i in set(wired_idx):
                    from .select import select_best_table_html

                    ocr_texts = self._ocr_texts(
                        crops[i], ocr_out=ocr_cache.get(i)
                    )
                    results[i] = select_best_table_html(
                        ocr_texts, results[i], wireless_html
                    )
                else:
                    results[i] = wireless_html
        if self.config.use_img2table and self.ocr is not None:
            # model-free borderless fallback for tables every learned
            # model left empty (reference: rapid_table.py:219-249 routes
            # wireless-classified tables to img2table with
            # borderless_tables=True)
            from .img2table import borderless_table_extract

            for i, html in enumerate(results):
                if html and "<td" in html:
                    continue
                try:
                    ocr_out = ocr_cache.get(i)
                    if ocr_out is None:
                        ocr_out = self.ocr([crops[i]])[0]
                    items = []
                    for it in ocr_out:
                        q = np.asarray(it["box"], float).reshape(-1)
                        items.append((
                            [q[0::2].min(), q[1::2].min(),
                             q[0::2].max(), q[1::2].max()],
                            it["text"],
                        ))
                except Exception:
                    continue
                fb = borderless_table_extract(items, crops[i].shape[:2])
                if fb:
                    results[i] = fb
        return results

    def _ocr_texts(self, crop: np.ndarray, ocr_out=None) -> list[str]:
        if ocr_out is not None:
            return [it["text"] for it in ocr_out]
        if self.ocr is None:
            return []
        try:
            return [it["text"] for it in self.ocr([crop])[0]]
        except Exception:
            return []

    # ------------------------------------------------------------- wired

    def _finish_wired(
        self, crop: np.ndarray, cell_boxes: list, grid: list,
        mfd: list | None = None, fill: list | None = None,
        ocr_out=None,
    ) -> str:
        if not cell_boxes and self.config.use_img2table:
            # model-free ruling-line fallback (reference:
            # rapid_table.py:219-249 img2table path)
            from .img2table import opencv_table_extract

            cell_boxes, grid = opencv_table_extract(crop)
        if not cell_boxes:
            return ""
        texts = self._cell_texts(crop, cell_boxes, mfd or [], fill or [],
                                 ocr_out=ocr_out)
        if self.config.enable_blank_cell_rec and self.ocr is not None:
            texts = self._retry_blank_cells(crop, cell_boxes, texts)
        return build_html_from_grid(grid, texts)

    def _retry_blank_cells(
        self, crop: np.ndarray, cell_boxes: list[list[float]],
        texts: list[str],
    ) -> list[str]:
        """Focused OCR on cells the page-level pass left empty — all
        blank cells of the table go through OCR as one batch."""
        h, w = crop.shape[:2]
        cells, owners = [], []
        for k, (box, text) in enumerate(zip(cell_boxes, texts)):
            if text.strip():
                continue
            x0, y0, x1, y1 = (max(int(box[0]), 0), max(int(box[1]), 0),
                              min(int(box[2]) + 1, w), min(int(box[3]) + 1, h))
            if x1 - x0 < 4 or y1 - y0 < 4:
                continue
            cells.append(crop[y0:y1, x0:x1])
            owners.append(k)
        if not cells:
            return texts
        try:
            results = self.ocr(cells)
        except Exception:
            return texts
        from .select import normalize_cell_text

        for k, items in zip(owners, results):
            if items:
                texts[k] = normalize_cell_text(
                    " ".join(it["text"] for it in items)
                )
        return texts

    def _fill_text(
        self, crop: np.ndarray, structure: list[str],
        bboxes: list[list[float]], mfd: list | None = None,
        fill: list | None = None, ocr_out=None,
    ) -> str:
        if not structure:
            return ""
        texts = (
            self._cell_texts(crop, bboxes, mfd or [], fill or [],
                             ocr_out=ocr_out)
            if bboxes else []
        )
        return html_from_structure_tokens(structure, texts)

    def _cell_texts(
        self, crop: np.ndarray, cell_boxes: list[list[float]],
        mfd: list | None = None, fill: list | None = None,
        ocr_out=None,
    ) -> list[str]:
        """OCR the table crop and distribute text into cells. Prefers
        word-level boxes so one OCR line straddling a cell border splits
        correctly (reference: analyze_utils.py:491-527 word-box table
        fill with line-level fallback). Recognized in-table formulas join
        the item list as $latex$."""
        if not cell_boxes:
            return []
        if self.ocr is None and not mfd and not fill:
            return [""] * len(cell_boxes)
        if ocr_out is None:
            if self.ocr is None:
                ocr_out = []
            else:
                try:
                    ocr_out = self.ocr([crop], return_word_boxes=True)[0]
                except TypeError:  # custom OCR without word-box support
                    ocr_out = self.ocr([crop])[0]
        items = []
        for it in ocr_out:
            if it.get("words"):
                for w in it["words"]:
                    poly = w["poly"]
                    items.append(
                        {"bbox": [min(p[0] for p in poly),
                                  min(p[1] for p in poly),
                                  max(p[0] for p in poly),
                                  max(p[1] for p in poly)],
                         "text": w["word"]}
                    )
            else:
                items.append(
                    {"bbox": [min(p[0] for p in it["box"]),
                              min(p[1] for p in it["box"]),
                              max(p[0] for p in it["box"]),
                              max(p[1] for p in it["box"])],
                     "text": it["text"]}
                )
        for box, latex in mfd or []:
            items.append({"bbox": list(box), "text": f"${latex}$"})
        for box, uid in fill or []:
            # uuid placeholder lands verbatim; resolved to <img> at save
            items.append({"bbox": list(box), "text": uid, "raw": True})
        assignments = match_ocr_to_cells(cell_boxes, items)
        from .select import normalize_cell_text

        out = []
        for idxs in assignments:
            frags = [items[i]["text"] for i in idxs]
            # CJK fragments join without separator, latin with space
            if frags and all(
                all(ord(c) > 0x2E80 for c in f) for f in frags if f
            ):
                out.append(normalize_cell_text("".join(frags)))
            else:
                out.append(normalize_cell_text(" ".join(frags)))
        return out
