"""OCR engine: detector + recognizer over JaxSessions.

The device-facing replacement for the reference's rapidocr wrapper
(reference: rapid_doc/model/ocr/rapid_ocr.py RapidOcrModel): batched,
bucket-grouped det and width-sorted rec, with all geometry on the host.
"""
from __future__ import annotations

import math
import os
from dataclasses import dataclass, field
from pathlib import Path
from typing import Sequence

import cv2
import jax
import numpy as np

from ...engine.buckets import DET_BUCKETS, REC_BUCKETS, BucketSpec, group_by_bucket
from ...engine.session import JaxSession, pad_image_to
from ...utils.logging import get_logger
from .convert import det_variables_from_torch, rec_variables_from_torch
from .det import DBNet
from .pre_post import (
    CTCLabelDecoder,
    DBPostParams,
    contrast_stretch as pp_contrast_stretch,
    det_normalize_device,
    det_resize,
    map_crop_box_to_quad,
    rec_normalize_device,
    rec_resize,
    rec_width_bucket,
    split_words,
    to_luma,
    word_boxes_in_crop,
)
from .rec import SVTRRec, ctc_greedy_decode

logger = get_logger("rapiddoc_tpu.ocr")

_VENDORED_DICT = (
    Path(__file__).resolve().parent.parent.parent
    / "assets"
    / "ppocrv6_small_dict.txt"
)


def default_charset_path() -> Path | None:
    import os

    p = os.environ.get("RAPIDDOC_OCR_DICT")
    if p and Path(p).is_file():
        return Path(p)
    from ...config import get_models_dir

    cand = get_models_dir() / "ppocrv6_small_dict.txt"
    if cand.is_file():
        return cand
    # vendored upstream PaddleOCR v6-small vocabulary (an artifact like
    # the model weights, shipped so the package is standalone)
    if _VENDORED_DICT.is_file():
        return _VENDORED_DICT
    return None


@dataclass
class DetResult:
    boxes: np.ndarray  # (N, 4, 2) quads in source pixels
    scores: np.ndarray


@dataclass
class RecResult:
    text: str
    score: float
    # optional word-level results: (word, score, [x0,y0,x1,y1] in crop px)
    words: list[tuple[str, float, list[float]]] | None = None


class TextDetector:
    def __init__(
        self,
        variables=None,
        *,
        bucket_spec: BucketSpec = DET_BUCKETS,
        post_params: DBPostParams | None = None,
        limit_side_len: int = 960,
        limit_type: str = "max",
        seed: int = 0,
        contrast_stretch: bool = False,
    ):
        self.model = DBNet()
        self.contrast_stretch = contrast_stretch
        if variables is None:
            variables = self.model.init(
                jax.random.PRNGKey(seed), np.zeros((1, 64, 64, 3), np.float32)
            )
        self.post_params = post_params or DBPostParams()
        self.limit_side_len = limit_side_len
        self.limit_type = limit_type
        # ship 1-byte/px luminance over the host->device link (the
        # measured bottleneck: ~30-50 MB/s on a tunneled chip); text is
        # achromatic so det geometry is unchanged. RAPIDDOC_RGB_TRANSFER=1
        # restores 3-channel transfers (e.g. for color-sensitive corpora).
        self.gray_transfer = not os.environ.get("RAPIDDOC_RGB_TRANSFER")
        # 4-bit luma wire (default; see TextRecognizer.nibble_wire).
        # RAPIDDOC_DET_WIRE_BITS=8 restores full depth for faint scans.
        self.nibble_wire = (
            self.gray_transfer
            and os.environ.get("RAPIDDOC_DET_WIRE_BITS", "4") == "4"
        )
        thresh = self.post_params.thresh
        self.prob4_wire = (
            os.environ.get("RAPIDDOC_DET_PROB_BITS", "4") == "4"
        )

        def det_apply(v, x):
            # device->host readback is the det bottleneck on a tunneled
            # chip (~10 MB/s for fresh buffers): ship (a) the exact
            # full-res threshold bitmap PACKED TO BITS (8x smaller than
            # uint8) for contour extraction, and (b) a 2x-downsampled
            # uint8 prob map for box scoring (a box's mean prob is
            # insensitive to 2x pooling) — ~10x less readback than the
            # full float32 map with identical detected geometry
            import jax.numpy as jnp

            prob = self.model.apply(v, x).astype(jnp.float32)
            prob = jnp.clip(prob[..., 0], 0.0, 1.0)  # (B, H, W)
            b, h, w = prob.shape
            bits = (prob > thresh).astype(jnp.uint8).reshape(b, h, w // 8, 8)
            weights = jnp.asarray(
                [128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8
            )
            packed = jnp.sum(bits * weights, axis=-1, dtype=jnp.uint8)
            # 2x pooling only: thin text lines (~12 px at a 960px page)
            # lose box score to background dilution at 4x and drop below
            # box_thresh — measured recall 0.88 -> 0.77 on the page eval
            pooled = prob.reshape(b, h // 2, 2, w // 2, 2).mean(axis=(2, 4))
            if self.prob4_wire:
                # 4-bit score map: box scoring averages MANY pixels, so
                # 16-level round-to-nearest quantization moves a box
                # score by << the box_thresh decision margin; halves the
                # score-map readback (RAPIDDOC_DET_PROB_BITS=8 restores
                # full depth)
                q = jnp.round(pooled * 15.0).astype(jnp.uint8)
                packed4 = (q[..., 0::2] << 4) | q[..., 1::2]
                return {"bits": packed, "prob4": packed4}
            prob_small = jnp.round(pooled * 255.0).astype(jnp.uint8)
            return {"bits": packed, "prob8": prob_small}

        from .pre_post import det_normalize_device_nibble

        self.session = JaxSession(
            det_apply,
            variables,
            bucket_spec,
            name="ocr_det",
            preproc=det_normalize_device_nibble
            if self.nibble_wire
            else det_normalize_device,
        )

    @classmethod
    def from_torch_state(cls, state_dict, **kw) -> "TextDetector":
        return cls(det_variables_from_torch(state_dict), **kw)

    def __call__(self, images: Sequence[np.ndarray]) -> list[DetResult]:
        """images: uint8 RGB HWC arrays of any sizes.

        Dense pages downscaled to the det limit can merge adjacent text
        lines into paragraph blobs (the reference avoids this by running
        det on layout-region crops, rapid_doc/backend/pipeline/
        analyze_utils.py:105; this full-page design refines instead):
        boxes much taller than the page's line height are re-detected at
        full crop resolution in one extra batched pass and replaced by
        their sub-lines.
        """
        results = self._detect(images)
        return self._refine_merged(images, results)

    def _detect(self, images: Sequence[np.ndarray]) -> list[DetResult]:
        prepped = []
        metas = []
        for img in images:
            resized, ry, rx = det_resize(img, self.limit_side_len, self.limit_type)
            metas.append((img.shape[0], img.shape[1], resized.shape[0], resized.shape[1]))
            if self.contrast_stretch:
                resized = pp_contrast_stretch(resized)
            if self.gray_transfer:
                resized = to_luma(resized)
            prepped.append(resized)  # uint8; normalize happens on device
        spec = self.session.bucket_spec
        groups = group_by_bucket([(m[2], m[3]) for m in metas], spec)
        results: list[DetResult | None] = [None] * len(images)
        # dispatch every resolution group before fetching any (groups
        # pipeline on the device stream)
        max_b = spec.max_batch()
        pending = []
        for (bh, bw), idxs in groups.items():
            batch_imgs = [pad_image_to(prepped[i], bh, bw) for i in idxs]
            if self.nibble_wire:
                from .pre_post import pack_nibbles

                batch_imgs = [pack_nibbles(b) for b in batch_imgs]
            handles = [
                self.session.dispatch(np.stack(batch_imgs[j : j + max_b]))
                for j in range(0, len(batch_imgs), max_b)
            ]
            pending.append((idxs, handles))
        for idxs, handles in pending:
            outs = self.session.fetch_rows(handles)
            for i, out in zip(idxs, outs):
                src_h, src_w, rh, rw = metas[i]
                # crop bucket padding, then scale boxes back to source pixels
                prob2d = self._reconstruct_prob(out)
                boxes, scores = self._post(prob2d, src_h, src_w, rh, rw)
                results[i] = DetResult(boxes, scores)
        return results  # type: ignore[return-value]

    def detect_polys(
        self,
        images: Sequence[np.ndarray],
        params=None,
        n_points: int = 8,
    ) -> list[list[np.ndarray]]:
        """Curved-text detection: per image, a list of 2k-point polygons
        (top edge left->right then bottom edge right->left) in source
        pixels — the reference seal det's det_box_type='poly' contract
        (rapid_doc/model/ocr/rapid_ocr.py:122-151). Pass the seal params
        (models/ocr/seal.SEAL_DET_PARAMS) for stamp crops."""
        from .pre_post import db_postprocess_poly

        prepped = []
        metas = []
        for img in images:
            resized, _, _ = det_resize(img, self.limit_side_len, self.limit_type)
            metas.append((img.shape[0], img.shape[1],
                          resized.shape[0], resized.shape[1]))
            if self.contrast_stretch:
                resized = pp_contrast_stretch(resized)
            if self.gray_transfer:
                resized = to_luma(resized)
            prepped.append(resized)
        spec = self.session.bucket_spec
        groups = group_by_bucket([(m[2], m[3]) for m in metas], spec)
        results: list[list[np.ndarray]] = [[] for _ in images]
        max_b = spec.max_batch()
        pending = []
        for (bh, bw), idxs in groups.items():
            batch_imgs = [pad_image_to(prepped[i], bh, bw) for i in idxs]
            if self.nibble_wire:
                from .pre_post import pack_nibbles

                batch_imgs = [pack_nibbles(b) for b in batch_imgs]
            handles = [
                self.session.dispatch(np.stack(batch_imgs[j : j + max_b]))
                for j in range(0, len(batch_imgs), max_b)
            ]
            pending.append((idxs, handles))
        for idxs, handles in pending:
            outs = self.session.fetch_rows(handles)
            for i, out in zip(idxs, outs):
                src_h, src_w, rh, rw = metas[i]
                prob2d = self._reconstruct_prob(out)
                polys, _scores = db_postprocess_poly(
                    prob2d, src_h, src_w, valid_h=rh, valid_w=rw,
                    params=params or self.post_params, n_points=n_points,
                )
                results[i] = polys
        return results

    def _refine_merged(
        self, images: Sequence[np.ndarray], results: list[DetResult]
    ) -> list[DetResult]:
        """Split multi-line det blobs via a second det pass on the crops."""
        jobs: list[tuple[int, int, int, int]] = []  # (img_i, box_j, x0, y0)
        crops: list[np.ndarray] = []
        for i, (img, res) in enumerate(zip(images, results)):
            if not len(res.boxes):
                continue
            heights = [
                float(q[:, 1].max() - q[:, 1].min()) for q in res.boxes
            ]
            small = [h for h in heights if h <= 80]
            med = float(np.median(small)) if small else 32.0
            limit = max(80.0, 2.5 * med)
            ih, iw = img.shape[:2]
            for j, (q, h) in enumerate(zip(res.boxes, heights)):
                w = float(q[:, 0].max() - q[:, 0].min())
                if h > limit and w >= 2.0 * med:
                    x0 = max(int(q[:, 0].min()) - 2, 0)
                    y0 = max(int(q[:, 1].min()) - 2, 0)
                    x1 = min(int(q[:, 0].max()) + 2, iw)
                    y1 = min(int(q[:, 1].max()) + 2, ih)
                    if y1 - y0 < 16 or x1 - x0 < 16:
                        continue
                    jobs.append((i, j, x0, y0))
                    crops.append(img[y0:y1, x0:x1])
        if not jobs:
            return results
        logger.info(
            "det refine: %d merged blobs re-detected at crop resolution",
            len(jobs),
        )
        sub_results = self._detect(crops)
        drop: dict[int, set[int]] = {}
        extra: dict[int, tuple[list, list]] = {}
        for (img_i, box_j, x0, y0), sub in zip(jobs, sub_results):
            if len(sub.boxes) <= 1:
                continue  # genuinely one line (e.g. a display heading)
            drop.setdefault(img_i, set()).add(box_j)
            eb, es = extra.setdefault(img_i, ([], []))
            for q, s in zip(sub.boxes, sub.scores):
                eb.append(q + np.asarray([x0, y0], q.dtype))
                es.append(s)
        for img_i, kill in drop.items():
            res = results[img_i]
            boxes = [q for j, q in enumerate(res.boxes) if j not in kill]
            scores = [s for j, s in enumerate(res.scores) if j not in kill]
            eb, es = extra[img_i]
            results[img_i] = DetResult(
                np.stack(boxes + eb).astype(np.float32),
                np.asarray(list(scores) + es, dtype=np.float32),
            )
        return results

    def _reconstruct_prob(self, out) -> np.ndarray:
        """Rebuild a prob map from the packed device output: the bitmap
        reproduces the exact full-res thresholding; the 2x uint8 map
        supplies the values box scoring averages over."""
        if isinstance(out, np.ndarray):  # legacy full map
            return out[..., 0] if out.ndim == 3 else out
        bits = out["bits"]
        h, w8 = bits.shape
        bitmap = np.unpackbits(bits, axis=1, count=w8 * 8).astype(bool)
        if "prob4" in out:
            p4 = out["prob4"]
            prob8 = np.empty((p4.shape[0], p4.shape[1] * 2), np.float32)
            prob8[:, 0::2] = (p4 >> 4).astype(np.float32) / 15.0
            prob8[:, 1::2] = (p4 & 15).astype(np.float32) / 15.0
        else:
            prob8 = out["prob8"].astype(np.float32) / 255.0
        prob = cv2.resize(
            prob8, (w8 * 8, h), interpolation=cv2.INTER_NEAREST
        )
        t = self.post_params.thresh
        # force host thresholding to agree with the device bitmap
        return np.where(
            bitmap, np.maximum(prob, t + 1e-3), np.minimum(prob, t - 1e-3)
        )

    def _post(self, prob2d, src_h, src_w, rh, rw):
        from .pre_post import db_postprocess

        return db_postprocess(
            prob2d, src_h, src_w, valid_h=rh, valid_w=rw, params=self.post_params
        )


class TextRecognizer:
    def __init__(
        self,
        variables=None,
        *,
        charset: list[str] | None = None,
        bucket_spec: BucketSpec = REC_BUCKETS,
        num_classes: int | None = None,
        drop_score: float = 0.5,
        seed: int = 0,
        contrast_stretch: bool = False,
    ):
        self.contrast_stretch = contrast_stretch
        if charset is None:
            path = default_charset_path()
            if path is not None:
                self.decoder = CTCLabelDecoder.from_file(str(path))
            else:
                self.decoder = CTCLabelDecoder([chr(32 + i) for i in range(95)])
        else:
            self.decoder = CTCLabelDecoder(charset)
        n_cls = num_classes or len(self.decoder.chars)
        self.model = SVTRRec(num_classes=n_cls)
        if variables is None:
            variables = self.model.init(
                jax.random.PRNGKey(seed), np.zeros((1, 48, 80, 3), np.float32)
            )
        self.drop_score = drop_score
        # luminance transfer (see TextDetector.gray_transfer)
        self.gray_transfer = not os.environ.get("RAPIDDOC_RGB_TRANSFER")
        # 4-bit luma wire (default): two pixels per byte, unpacked and
        # dequantized on device — rec is transfer-bound on a tunneled
        # chip and text-line crops are near-binary. RAPIDDOC_REC_WIRE_BITS=8
        # restores the full-depth wire (e.g. for faint-scan corpora).
        self.nibble_wire = (
            self.gray_transfer
            and os.environ.get("RAPIDDOC_REC_WIRE_BITS", "4") == "4"
        )

        def rec_apply(v, x):
            import os

            # the fused pallas head pays off on TPU; off-TPU it would run
            # in the (slow) interpreter except for tiny vocabularies, so
            # fall back to the plain head there
            use_fused = (
                not os.environ.get("RAPIDDOC_NO_FUSED_CTC")
                and (jax.default_backend() == "tpu" or n_cls <= 4096)
            )
            if not use_fused:
                return ctc_greedy_decode(self.model.apply(v, x))
            from ...ops.ctc_head import ctc_head_decode

            seq = self.model.apply(v, x, features_only=True)
            head = v["params"]["head"]
            return ctc_head_decode(seq, head["kernel"], head["bias"])

        from .pre_post import rec_normalize_device_nibble

        self.session = JaxSession(
            rec_apply,
            variables,
            bucket_spec,
            name="ocr_rec",
            preproc=rec_normalize_device_nibble
            if self.nibble_wire
            else rec_normalize_device,
        )

    @classmethod
    def from_torch_state(cls, state_dict, **kw) -> "TextRecognizer":
        return cls(rec_variables_from_torch(state_dict), **kw)

    def __call__(
        self, crops: Sequence[np.ndarray], return_words: bool = False
    ) -> list[RecResult]:
        """crops: uint8 RGB text-line images. With return_words, each
        result carries (word, score, bbox-in-crop) tuples (reference:
        rapid_ocr.py calc_word_boxes :301-329)."""
        if not len(crops):
            return []
        spec = self.session.bucket_spec
        widths = spec.widths
        buckets = [
            rec_width_bucket(c.shape[1], c.shape[0], widths) for c in crops
        ]
        groups: dict[int, list[int]] = {}
        for i, wb in enumerate(buckets):
            groups.setdefault(wb, []).append(i)
        results: list[RecResult | None] = [None] * len(crops)
        # dispatch every width-bucket group before fetching any — groups
        # pipeline on the device stream instead of serializing roundtrips
        max_b = self.session.bucket_spec.max_batch()
        pending = []
        for wb, idxs in groups.items():
            # sort by true aspect so padded tails cluster (cache-friendly)
            idxs = sorted(idxs, key=lambda i: crops[i].shape[1] / max(crops[i].shape[0], 1))
            if self.contrast_stretch:
                batch = [
                    rec_resize(pp_contrast_stretch(crops[i]), wb)
                    for i in idxs
                ]  # uint8
            else:
                batch = [rec_resize(crops[i], wb) for i in idxs]  # uint8
            if self.gray_transfer:
                batch = [to_luma(b) for b in batch]
            if self.nibble_wire:
                from .pre_post import pack_nibbles

                batch = [pack_nibbles(b) for b in batch]
            handles = [
                self.session.dispatch(np.stack(batch[j : j + max_b]))
                for j in range(0, len(batch), max_b)
            ]
            pending.append((wb, idxs, handles))
        for wb, idxs, handles in pending:
            outs = self.session.fetch_rows(handles)
            for i, (ids, probs) in zip(idxs, outs):
                valid_t = max(1, int(math.ceil(
                    min(wb, crops[i].shape[1] * 48 / max(crops[i].shape[0], 1)) / 8
                )))
                if return_words:
                    text, score, frames = self.decoder.decode_with_positions(
                        ids, probs, valid_t=valid_t
                    )
                    ch, cw = crops[i].shape[:2]
                    words = split_words(text, frames)
                    wboxes = word_boxes_in_crop(words, valid_t, cw, ch)
                    word_items = [
                        (w[0], score, box) for w, box in zip(words, wboxes)
                    ]
                    results[i] = RecResult(text, score, word_items)
                else:
                    text, score = self.decoder(ids, probs, valid_t=valid_t)
                    results[i] = RecResult(text, score)
        return results  # type: ignore[return-value]


def crop_quad(img: np.ndarray, quad: np.ndarray) -> np.ndarray:
    """Perspective-crop a detected quad into an upright text-line image."""
    quad = quad.astype(np.float32)
    w = int(max(np.linalg.norm(quad[0] - quad[1]), np.linalg.norm(quad[2] - quad[3])))
    h = int(max(np.linalg.norm(quad[0] - quad[3]), np.linalg.norm(quad[1] - quad[2])))
    w, h = max(w, 1), max(h, 1)
    # axis-aligned quads (the vast majority of DB boxes on straight
    # pages) crop with a plain slice copy instead of a perspective warp
    xs, ys = quad[:, 0], quad[:, 1]
    if (
        abs(ys[0] - ys[1]) <= 1.0 and abs(ys[2] - ys[3]) <= 1.0
        and abs(xs[0] - xs[3]) <= 1.0 and abs(xs[1] - xs[2]) <= 1.0
    ):
        ih, iw = img.shape[:2]
        x0 = max(int(round(xs.min())), 0)
        y0 = max(int(round(ys.min())), 0)
        out = np.ascontiguousarray(img[y0 : y0 + h, x0 : x0 + w])
        if out.shape[0] >= 1 and out.shape[1] >= 1:
            if out.shape[0] > out.shape[1] * 1.5:  # vertical text
                out = np.rot90(out, 3)
            return out
    dst = np.array([[0, 0], [w, 0], [w, h], [0, h]], dtype=np.float32)
    mat = cv2.getPerspectiveTransform(quad, dst)
    out = cv2.warpPerspective(img, mat, (w, h))
    if h > w * 1.5:  # vertical text: rotate to horizontal
        out = np.rot90(out, 3)
    return out


class TextSystem:
    """det + rec pipeline over full images."""

    def __init__(self, detector: TextDetector, recognizer: TextRecognizer,
                 drop_score: float = 0.5):
        self.detector = detector
        self.recognizer = recognizer
        self.drop_score = drop_score

    def __call__(
        self, images: Sequence[np.ndarray], return_word_boxes: bool = False
    ):
        det_results = self.detector(images)
        all_crops: list[np.ndarray] = []
        owners: list[tuple[int, int]] = []
        for img_idx, det in enumerate(det_results):
            for box_idx, quad in enumerate(det.boxes):
                all_crops.append(crop_quad(images[img_idx], quad))
                owners.append((img_idx, box_idx))
        rec_results = self.recognizer(all_crops, return_words=return_word_boxes)
        out: list[list[dict]] = [[] for _ in images]
        for crop, (img_idx, box_idx), rec in zip(all_crops, owners, rec_results):
            if rec.score < self.drop_score:
                continue
            det = det_results[img_idx]
            item = {
                "box": det.boxes[box_idx].tolist(),
                "det_score": float(det.scores[box_idx]),
                "text": rec.text,
                "score": rec.score,
            }
            if return_word_boxes and rec.words:
                quad = det.boxes[box_idx].astype(np.float32)
                ch, cw = crop.shape[:2]
                # vertical lines were rot90'd in crop_quad: the homography
                # no longer applies, fall back to the whole line quad
                qw = max(np.linalg.norm(quad[0] - quad[1]),
                         np.linalg.norm(quad[2] - quad[3]))
                qh = max(np.linalg.norm(quad[0] - quad[3]),
                         np.linalg.norm(quad[1] - quad[2]))
                rotated = qh > qw * 1.5
                words = []
                for word, wscore, wbox in rec.words:
                    if rotated:
                        poly = quad.astype(np.float64)
                    else:
                        poly = map_crop_box_to_quad(wbox, cw, ch, quad)
                    words.append(
                        {"word": word, "score": wscore,
                         "poly": np.asarray(poly).tolist()}
                    )
                item["words"] = words
            out[img_idx].append(item)
        return out
