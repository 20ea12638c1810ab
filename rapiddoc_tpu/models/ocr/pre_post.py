"""Host-side pre/post-processing for OCR det & rec.

Conventions follow the PP-OCR pipeline as configured by the reference
(reference: rapid_doc/model/ocr/rapid_ocr.py:44-98 — det limit 960/max,
imagenet mean/std, box_thresh 0.5, unclip 1.8, dilation on; rec H=48,
[-1,1] normalize). The quad unclip is computed analytically on the
min-area rect (equivalent to the reference's pyclipper offset for quads —
this environment has no pyclipper).
"""
from __future__ import annotations

import math
from dataclasses import dataclass

import cv2
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


# ------------------------------------------------------------------ det pre

def det_resize(
    img: np.ndarray, limit_side_len: int = 960, limit_type: str = "max",
    max_side_limit: int = 4000,
) -> tuple[np.ndarray, float, float]:
    """Resize so the max (or min) side respects the limit; sides to /32."""
    h, w = img.shape[:2]
    if limit_type == "max":
        ratio = min(1.0, limit_side_len / max(h, w))
    else:
        ratio = max(1.0, limit_side_len / max(min(h, w), 1))
    if max(h, w) * ratio > max_side_limit:
        ratio = max_side_limit / max(h, w)
    rh = max(32, int(round(h * ratio / 32) * 32))
    rw = max(32, int(round(w * ratio / 32) * 32))
    resized = cv2.resize(img, (rw, rh))
    return resized, rh / h, rw / w


def det_normalize(img: np.ndarray) -> np.ndarray:
    """uint8 HWC RGB -> float32 normalized HWC."""
    x = img.astype(np.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def det_normalize_device(x):
    """Device-side det normalize (uint8 NHWC in-graph; see
    JaxSession(preproc=...)). Keeps host->device traffic at 1 byte/px.
    Single-channel (luminance) batches broadcast to RGB in-graph — the
    tunneled host->device link is the det bottleneck, and text pages are
    achromatic, so callers may ship 1/3 of the bytes."""
    import jax.numpy as jnp

    if x.shape[-1] == 1:
        x = jnp.broadcast_to(x, (*x.shape[:-1], 3))
    x = x.astype(jnp.float32) / 255.0
    return (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)


def det_normalize_device_nibble(x):
    """Device-side inverse of :func:`pack_nibbles` + det normalize:
    (N, H, W/2, 1) uint8 -> (N, H, W, 3) ImageNet-normalized. Half the
    det wire bytes of the luma path (see rec_normalize_device_nibble)."""
    import jax.numpy as jnp

    hi = x >> 4
    lo = x & 15
    n, h, w2, _ = x.shape
    y = jnp.stack([hi, lo], axis=3).reshape(n, h, w2 * 2, 1) * 17
    y = jnp.broadcast_to(y, (n, h, w2 * 2, 3)).astype(jnp.float32) / 255.0
    return (y - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)


def rec_normalize_device(x):
    """Device-side rec normalize: uint8 -> [-1, 1]; 1-channel batches
    broadcast to RGB in-graph (see det_normalize_device)."""
    import jax.numpy as jnp

    if x.shape[-1] == 1:
        x = jnp.broadcast_to(x, (*x.shape[:-1], 3))
    return x.astype(jnp.float32) / 127.5 - 1.0


def pack_nibbles(img: np.ndarray) -> np.ndarray:
    """(H, W, 1) uint8 luma -> (H, W/2, 1) with two 4-bit pixels per
    byte (even column in the high nibble). Text-line crops are
    near-binary ink-on-paper; 16 gray levels lose nothing the CTC head
    can see, and the wire — the rec stage's ceiling on a tunneled chip —
    carries half the bytes. W is even for every rec bucket."""
    q = img[..., 0] >> 4  # (H, W) in 0..15
    if q.shape[1] % 2:
        q = np.pad(q, ((0, 0), (0, 1)))
    return ((q[:, 0::2] << 4) | q[:, 1::2])[..., None]


def rec_normalize_device_nibble(x):
    """Device-side inverse of :func:`pack_nibbles` + rec normalize:
    (N, H, W/2, 1) uint8 -> (N, H, W, 3) in [-1, 1]. Nibble values scale
    by 17 (15*17 = 255) so the dequantized range matches uint8."""
    import jax.numpy as jnp

    hi = x >> 4
    lo = x & 15
    n, h, w2, _ = x.shape
    y = jnp.stack([hi, lo], axis=3).reshape(n, h, w2 * 2, 1) * 17
    y = jnp.broadcast_to(y, (n, h, w2 * 2, 3))
    return y.astype(jnp.float32) / 127.5 - 1.0


def contrast_stretch(
    img: np.ndarray, lo_pct: float = 2.0, hi_pct: float = 98.0
) -> np.ndarray:
    """Percentile contrast stretch for faded scans/photos (uint8).

    The demo checkpoints are trained on synthetic pages whose ink spans
    the full dynamic range; washed-out real scans (low-contrast ink)
    tripled rec CER (0.05 -> 0.14 measured). Stretching the 2-98
    percentile window to [0, 255] recovers the training distribution at
    ~1 ms/page (uint8 histogram percentiles, no sort). Published
    checkpoints are trained on real data and don't need this — the flag
    is only set for demo weights."""
    if img.dtype != np.uint8:
        return img
    hist = np.bincount(img.reshape(-1), minlength=256).cumsum()
    total = hist[-1]
    if total == 0:
        return img
    lo = int(np.searchsorted(hist, total * lo_pct / 100.0))
    hi = int(np.searchsorted(hist, total * hi_pct / 100.0))
    if hi - lo < 10 or (lo <= 6 and hi >= 249):
        return img  # degenerate or already (near) full range
    lut = np.clip(
        (np.arange(256, dtype=np.float32) - lo) * (255.0 / (hi - lo)),
        0, 255,
    ).astype(np.uint8)
    return lut[img]


def to_luma(img: np.ndarray) -> np.ndarray:
    """uint8 HWC RGB -> (H, W, 1) luminance for low-bandwidth transfer."""
    if img.ndim == 2:
        return img[..., None]
    if img.shape[-1] == 1:
        return img
    return cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)[..., None]


# ----------------------------------------------------------------- det post

@dataclass
class DBPostParams:
    thresh: float = 0.3
    box_thresh: float = 0.5
    unclip_ratio: float = 1.8
    max_candidates: int = 1000
    min_size: int = 3
    use_dilation: bool = True
    score_mode: str = "fast"


def _box_score_fast(bitmap: np.ndarray, box: np.ndarray) -> float:
    h, w = bitmap.shape[:2]
    xmin = int(np.clip(np.floor(box[:, 0].min()), 0, w - 1))
    xmax = int(np.clip(np.ceil(box[:, 0].max()), 0, w - 1))
    ymin = int(np.clip(np.floor(box[:, 1].min()), 0, h - 1))
    ymax = int(np.clip(np.ceil(box[:, 1].max()), 0, h - 1))
    mask = np.zeros((ymax - ymin + 1, xmax - xmin + 1), dtype=np.uint8)
    shifted = box.copy()
    shifted[:, 0] -= xmin
    shifted[:, 1] -= ymin
    cv2.fillPoly(mask, [shifted.astype(np.int32)], 1)
    region = bitmap[ymin : ymax + 1, xmin : xmax + 1]
    if mask.sum() == 0:
        return 0.0
    return float(cv2.mean(region, mask)[0])


def _unclip_rect(rect, unclip_ratio: float):
    """Offset a min-area rect outward by area*ratio/perimeter."""
    (cx, cy), (rw, rh), angle = rect
    area = rw * rh
    perimeter = 2 * (rw + rh)
    if perimeter <= 0:
        return rect
    d = area * unclip_ratio / perimeter
    return ((cx, cy), (rw + 2 * d, rh + 2 * d), angle)


def _order_quad(pts: np.ndarray) -> np.ndarray:
    """Order 4 points clockwise starting top-left."""
    idx = np.argsort(pts[:, 0])
    left = pts[idx[:2]][np.argsort(pts[idx[:2]][:, 1])]
    right = pts[idx[2:]][np.argsort(pts[idx[2:]][:, 1])]
    return np.array([left[0], right[0], right[1], left[1]], dtype=np.float32)


def db_postprocess(
    prob_map: np.ndarray,
    src_h: int,
    src_w: int,
    valid_h: int | None = None,
    valid_w: int | None = None,
    params: DBPostParams | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """prob map (H, W) at network scale -> (boxes Nx4x2 in source pixels, scores).

    valid_h/valid_w crop off bucket padding before box extraction.
    """
    p = params or DBPostParams()
    prob = prob_map[..., 0] if prob_map.ndim == 3 else prob_map
    if valid_h is not None:
        prob = prob[:valid_h, :valid_w]
    seg = (prob > p.thresh).astype(np.uint8)
    if p.use_dilation:
        seg = cv2.dilate(seg, np.array([[1, 1], [1, 1]], dtype=np.uint8))
    contours, _ = cv2.findContours(seg, cv2.RETR_LIST, cv2.CHAIN_APPROX_SIMPLE)
    h, w = prob.shape
    scale_x = src_w / w
    scale_y = src_h / h
    boxes, scores = [], []
    for contour in contours[: p.max_candidates]:
        rect = cv2.minAreaRect(contour)
        if min(rect[1]) < p.min_size:
            continue
        pts = cv2.boxPoints(rect)
        score = _box_score_fast(prob, pts)
        if score < p.box_thresh:
            continue
        rect = _unclip_rect(rect, p.unclip_ratio)
        if min(rect[1]) < p.min_size + 2:
            continue
        pts = _order_quad(cv2.boxPoints(rect))
        pts[:, 0] = np.clip(pts[:, 0] * scale_x, 0, src_w)
        pts[:, 1] = np.clip(pts[:, 1] * scale_y, 0, src_h)
        boxes.append(pts)
        scores.append(score)
    if not boxes:
        return np.zeros((0, 4, 2), dtype=np.float32), np.zeros((0,), dtype=np.float32)
    return np.stack(boxes), np.asarray(scores, dtype=np.float32)


def db_postprocess_poly(
    prob_map: np.ndarray,
    src_h: int,
    src_w: int,
    valid_h: int | None = None,
    valid_w: int | None = None,
    params: DBPostParams | None = None,
    n_points: int = 8,
) -> tuple[list[np.ndarray], np.ndarray]:
    """DB prob map -> 2k-point text polygons (curved-text mode).

    The poly convention matches the reference seal det (reference:
    rapid_doc/model/ocr/rapid_ocr.py:122-151 det_box_type='poly' +
    seal_det_warp.py:119-616 AutoRectifier input): first k points trace
    the top edge left->right, last k the bottom edge right->left. Edges
    are sampled column-wise from the filled component mask, so arbitrary
    vertical curvature (arcs, waves) is captured; near-vertical text
    degrades to the minAreaRect quad (column sampling is then
    meaningless) — the quad path handles it as the reference does.
    Returns (list of (2k, 2) float32 polys in source pixels, scores).
    """
    p = params or DBPostParams()
    prob = prob_map[..., 0] if prob_map.ndim == 3 else prob_map
    if valid_h is not None:
        prob = prob[:valid_h, :valid_w]
    seg = (prob > p.thresh).astype(np.uint8)
    if p.use_dilation:
        seg = cv2.dilate(seg, np.array([[1, 1], [1, 1]], dtype=np.uint8))
    contours, _ = cv2.findContours(seg, cv2.RETR_LIST, cv2.CHAIN_APPROX_SIMPLE)
    h, w = prob.shape
    scale_x = src_w / w
    scale_y = src_h / h
    polys: list[np.ndarray] = []
    scores = []
    for contour in contours[: p.max_candidates]:
        rect = cv2.minAreaRect(contour)
        if min(rect[1]) < p.min_size:
            continue
        x, y, cw, chh = cv2.boundingRect(contour)
        mask = np.zeros((chh, cw), np.uint8)
        cv2.drawContours(mask, [contour - [x, y]], -1, 1, -1)
        # score over the component mask, not the minAreaRect — a curved
        # band's rect is mostly background and would dilute the score
        # below box_thresh (the quad scorer's known failure on arcs)
        region = prob[y : y + chh, x : x + cw]
        denom = float(mask.sum())
        score = float((region * mask).sum() / denom) if denom else 0.0
        if score < p.box_thresh:
            continue
        # unclip: pad the component outward by ~unclip_ratio x thickness
        thickness = max(1.0, float(mask.sum()) / max(cw, 1))
        pad = max(1, int(round(thickness * p.unclip_ratio)))
        mask = np.pad(mask, pad)
        mask = cv2.dilate(
            mask, cv2.getStructuringElement(cv2.MORPH_ELLIPSE,
                                            (2 * pad + 1, 2 * pad + 1))
        )
        cols = np.where(mask.any(axis=0))[0]
        if len(cols) < 2 or cw < chh:  # degenerate / vertical: quad path
            pts = _order_quad(cv2.boxPoints(_unclip_rect(rect, p.unclip_ratio)))
            pts = np.concatenate([pts[:2], pts[2:]], axis=0)
            top = pts[:2]
            bot = pts[2:]
            poly = np.concatenate([top, bot], axis=0).astype(np.float32)
        else:
            sample_x = np.linspace(cols[0], cols[-1], n_points)
            top_pts, bot_pts = [], []
            for sx in sample_x:
                col = mask[:, int(round(sx))]
                ys = np.where(col)[0]
                if not len(ys):  # gap inside the band: interpolate later
                    top_pts.append(None)
                    bot_pts.append(None)
                    continue
                top_pts.append((sx, float(ys[0])))
                bot_pts.append((sx, float(ys[-1])))
            filled = [(t, b) for t, b in zip(top_pts, bot_pts)
                      if t is not None]
            if len(filled) < 2:
                continue
            top = np.asarray([t for t, _ in filled], np.float32)
            bot = np.asarray([b for _, b in filled], np.float32)
            poly = np.concatenate([top, bot[::-1]], axis=0)
            poly += [x - pad, y - pad]
        poly[:, 0] = np.clip(poly[:, 0] * scale_x, 0, src_w)
        poly[:, 1] = np.clip(poly[:, 1] * scale_y, 0, src_h)
        polys.append(poly.astype(np.float32))
        scores.append(score)
    return polys, np.asarray(scores, dtype=np.float32)


# ------------------------------------------------------------------ rec pre

REC_HEIGHT = 48


def rec_resize(img: np.ndarray, target_w: int, height: int = REC_HEIGHT) -> np.ndarray:
    """Keep-ratio resize to rec height, right-pad with zeros to target_w."""
    h, w = img.shape[:2]
    ratio = height / max(h, 1)
    rw = max(1, min(target_w, int(math.ceil(w * ratio))))
    resized = cv2.resize(img, (rw, height))
    out = np.zeros((height, target_w, 3), dtype=img.dtype)
    out[:, :rw] = resized if resized.ndim == 3 else resized[..., None]
    return out


def rec_normalize(img: np.ndarray) -> np.ndarray:
    """uint8 -> [-1, 1] float32 (PP-OCR rec convention)."""
    return img.astype(np.float32) / 127.5 - 1.0


def rec_width_bucket(w: int, h: int, widths: tuple[int, ...]) -> int:
    """Pick the smallest width bucket that fits the aspect-scaled crop."""
    target = int(math.ceil(w * REC_HEIGHT / max(h, 1)))
    for wb in widths:
        if target <= wb:
            return wb
    return widths[-1]


# ----------------------------------------------------------------- charsets

class CTCLabelDecoder:
    """CTC greedy decoder over a character dictionary.

    Dictionary layout matches PP-OCR: index 0 = blank, then dict entries,
    final entry is space (reference dict: rapid_doc/resources/
    ppocrv6_small_dict.txt + implicit blank/space handling).
    """

    def __init__(self, charset: list[str]):
        # charset: raw dictionary lines (no blank). Final vocab:
        # [blank] + charset + [' ']
        self.chars = [""] + list(charset) + [" "]

    @classmethod
    def from_file(cls, path: str) -> "CTCLabelDecoder":
        with open(path, encoding="utf-8") as f:
            lines = [ln.rstrip("\n\r") for ln in f]
        return cls([ln for ln in lines if ln != ""])

    def __call__(
        self, ids: np.ndarray, probs: np.ndarray, valid_t: int | None = None
    ) -> tuple[str, float]:
        """ids/probs: (T,) greedy argmax ids and their probabilities."""
        text, score, _ = self.decode_with_positions(ids, probs, valid_t)
        return text, score

    def decode_with_positions(
        self, ids: np.ndarray, probs: np.ndarray, valid_t: int | None = None
    ) -> tuple[str, float, list[int]]:
        """Greedy decode also returning each emitted char's frame index
        (for word-box geometry, reference: rapid_ocr.py calc_word_boxes
        :301-329 / rapidocr cal_rec_boxes)."""
        if valid_t is not None:
            ids = ids[:valid_t]
            probs = probs[:valid_t]
        out: list[str] = []
        confs: list[float] = []
        frames: list[int] = []
        prev = -1
        for i, t in enumerate(ids.tolist()):
            if t != prev and t != 0:
                if t < len(self.chars):
                    out.append(self.chars[t])
                    confs.append(float(probs[i]))
                    frames.append(i)
            prev = t
        if not out:
            return "", 0.0, []
        return "".join(out), float(np.mean(confs)), frames


def _is_cjk(ch: str) -> bool:
    o = ord(ch)
    return (
        0x2E80 <= o <= 0x9FFF or 0xF900 <= o <= 0xFAFF
        or 0xFF00 <= o <= 0xFFEF or 0x3000 <= o <= 0x303F
    )


def split_words(text: str, frames: list[int]) -> list[tuple[str, int, int]]:
    """Group decoded chars into words: CJK chars stand alone, latin runs
    group until whitespace. Returns (word, first_frame, last_frame)."""
    words: list[tuple[str, int, int]] = []
    cur = ""
    f0 = f1 = -1
    for ch, fr in zip(text, frames):
        if ch.isspace():
            if cur:
                words.append((cur, f0, f1))
                cur = ""
            continue
        if _is_cjk(ch):
            if cur:
                words.append((cur, f0, f1))
                cur = ""
            words.append((ch, fr, fr))
        else:
            if not cur:
                cur, f0 = ch, fr
            else:
                cur += ch
            f1 = fr
    if cur:
        words.append((cur, f0, f1))
    return words


def word_boxes_in_crop(
    words: list[tuple[str, int, int]], total_frames: int,
    crop_w: int, crop_h: int,
) -> list[list[float]]:
    """Frame span -> x-span boxes inside the rectified crop. Each frame
    covers crop_w/total_frames px; half a frame of margin each side."""
    if total_frames <= 0:
        return [[0, 0, crop_w, crop_h] for _ in words]
    px = crop_w / total_frames
    out = []
    for _, f0, f1 in words:
        x0 = max(0.0, f0 * px)
        x1 = min(float(crop_w), (f1 + 1) * px)
        out.append([x0, 0.0, x1, float(crop_h)])
    return out


def map_crop_box_to_quad(
    box: list[float], crop_w: int, crop_h: int, quad: np.ndarray
) -> np.ndarray:
    """Rect box in rectified-crop coords -> 4-point polygon in source-image
    coords via the inverse of the rectification homography."""
    quad = quad.astype(np.float32)
    dst = np.array(
        [[0, 0], [crop_w, 0], [crop_w, crop_h], [0, crop_h]], np.float32
    )
    m = cv2.getPerspectiveTransform(dst, quad)
    x0, y0, x1, y1 = box
    pts = np.array(
        [[[x0, y0]], [[x1, y0]], [[x1, y1]], [[x0, y1]]], np.float32
    )
    return cv2.perspectiveTransform(pts, m).reshape(4, 2)
