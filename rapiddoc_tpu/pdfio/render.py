"""Page rasterization to PIL (feeds the layout/OCR models).

Role equivalent of pdfium rendering in the reference
(reference: rapid_doc/utils/pdf_image_tools.py:26-48, DPI 200 default).
Text is drawn with the embedded font program via FreeType when it can map
unicode, else with a system fallback; scanned-page images (the OCR-path
case that actually feeds model pixels) are decoded exactly.
"""
from __future__ import annotations

import io
import math
from typing import Any

import numpy as np
from PIL import Image, ImageDraw, ImageFont

from .content import ContentInterpreter, Matrix, mat_apply, mat_mul
from .cos import Stream
from .document import PdfDocument, PdfPage
from .fonts import Font
from .images import xobject_to_pil
from .text import page_base_ctm

def _discover_fallback_fonts() -> list[str]:
    """Candidate system fonts for glyphs the embedded programs can't map.

    Scans the usual font roots (Linux/mac/Windows) instead of pinning one
    DejaVu path — hosts without DejaVu would otherwise silently degrade
    to PIL's 8-px bitmap default. Override/extend with
    RAPIDDOC_FALLBACK_FONT=<path>."""
    import glob as _glob
    import os as _os

    cands: list[str] = []
    env = _os.environ.get("RAPIDDOC_FALLBACK_FONT")
    if env:
        cands.append(env)
    cands.append("/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf")
    patterns = [
        "/usr/share/fonts/**/DejaVuSans.ttf",
        "/usr/share/fonts/**/LiberationSans-Regular.ttf",
        "/usr/share/fonts/**/NotoSans-Regular.ttf",
        "/usr/share/fonts/**/FreeSans.ttf",
        "/System/Library/Fonts/Helvetica.ttc",
        "C:/Windows/Fonts/arial.ttf",
    ]
    for pat in patterns:
        if "*" in pat:
            cands.extend(sorted(_glob.glob(pat, recursive=True))[:1])
        elif _os.path.exists(pat):
            cands.append(pat)
    # last resort: ANY ttf on the host beats the bitmap default
    if not any(_os.path.exists(c) for c in cands):
        anyttf = sorted(
            _glob.glob("/usr/share/fonts/**/*.ttf", recursive=True)
        )[:1]
        cands.extend(anyttf)
    return cands


_FALLBACK_FONTS_CACHE: list[str] | None = None


def _fallback_fonts() -> list[str]:
    """Lazy: the /usr/share/fonts glob walk (hundreds of ms on big
    font trees) only runs the first time a fallback glyph is actually
    needed, not at import."""
    global _FALLBACK_FONTS_CACHE
    if _FALLBACK_FONTS_CACHE is None:
        _FALLBACK_FONTS_CACHE = _discover_fallback_fonts()
    return _FALLBACK_FONTS_CACHE


class _FontBank:
    """Caches FreeType faces per (font, pixel size)."""

    def __init__(self) -> None:
        self._cache: dict[tuple[int, int], Any] = {}
        self._broken: set[int] = set()
        self._fallback_cache: dict[int, Any] = {}

    def face(self, font: Font, px: int):
        px = max(2, min(int(px), 512))
        key = (id(font), px)
        if key in self._cache:
            return self._cache[key]
        face = None
        if font.font_program and id(font) not in self._broken:
            try:
                face = ImageFont.truetype(io.BytesIO(font.font_program), px)
            except Exception:
                self._broken.add(id(font))
        self._cache[key] = face
        return face

    def fallback(self, px: int):
        px = max(2, min(int(px), 512))
        if px not in self._fallback_cache:
            face = None
            for path in _fallback_fonts():
                try:
                    face = ImageFont.truetype(path, px)
                    break
                except Exception:
                    continue
            if face is None and not getattr(_FontBank, "_warned", False):
                _FontBank._warned = True
                import logging

                logging.getLogger("rapiddoc_tpu.pdfio").warning(
                    "no scalable system fallback font found (checked %d "
                    "paths) — unmapped glyphs will render with PIL's "
                    "bitmap default; set RAPIDDOC_FALLBACK_FONT=<ttf>",
                    len(_fallback_fonts()),
                )
            self._fallback_cache[px] = face or ImageFont.load_default()
        return self._fallback_cache[px]

    def covers(self, face, text: str) -> bool:
        """Whether the face draws ink for `text` (subset fonts often can't)."""
        if face is None:
            return False
        try:
            bbox = face.getbbox(text)
            return bbox is not None and bbox[2] > bbox[0] and bbox[3] > bbox[1]
        except Exception:
            return False


class PageRasterizer(ContentInterpreter):
    def __init__(self, page: PdfPage, scale: float = 1.0, background=(255, 255, 255)):
        super().__init__(page)
        self.scale = scale
        w, h = page.size
        self.width = max(1, int(round(w * scale)))
        self.height = max(1, int(round(h * scale)))
        self.canvas = Image.new("RGB", (self.width, self.height), background)
        self.draw = ImageDraw.Draw(self.canvas, "RGBA")
        # font faces + glyph tiles cache at DOCUMENT scope: pages of one
        # document repeat the same glyphs (CJK pages re-rendered ~2x
        # faster), and Font object ids stay valid for the document's life
        doc = self.doc
        bank = getattr(doc, "_render_fontbank", None)
        if bank is None:
            bank = _FontBank()
            doc._render_fontbank = bank
        self.fontbank = bank
        covers = getattr(doc, "_render_font_covers", None)
        if covers is None:
            covers = {}
            doc._render_font_covers = covers
        self._font_covers: dict[tuple[int, str], bool] = covers
        cache = getattr(doc, "_render_glyph_cache", None)
        if cache is None:
            cache = {}
            doc._render_glyph_cache = cache
        self._glyph_cache: dict[tuple, tuple] = cache
        # per-run invariants (see on_show_char) and face picks, doc scope
        rc = getattr(doc, "_render_run_cache", None)
        if rc is None:
            rc = {}
            doc._render_run_cache = rc
        self._run_cache: dict[tuple, tuple] = rc
        fp = getattr(doc, "_render_face_picks", None)
        if fp is None:
            fp = {}
            doc._render_face_picks = fp
        self._face_picks: dict[tuple, Any] = fp
        rt = getattr(doc, "_render_rot_cache", None)
        if rt is None:
            rt = {}
            doc._render_rot_cache = rt
        self._rot_cache: dict[tuple, Any] = rt
        self.canvas.load()

    # ---------------------------------------------------------------- public

    def render(self) -> Image.Image:
        # base ctm kept for pattern-space mapping (pattern matrices map
        # pattern space to the page's default space, not the current ctm)
        self._base_ctm = page_base_ctm(self.page, self.scale)
        self.run(self._base_ctm)
        return self.canvas

    # ----------------------------------------------------------------- hooks

    def on_paint_path(
        self, path: list[list[tuple[float, float]]], *, stroke: bool, fill: bool,
        even_odd: bool,
    ) -> None:
        gs = self.gs
        if fill:
            if gs.fill_pattern is not None:
                self._fill_with_pattern(path, even_odd)
            else:
                color = tuple(int(c * 255) for c in gs.fill_color) + (
                    int(255 * gs.fill_alpha),
                )
                self._paint_polys(path, color, even_odd)
        if stroke:
            color = tuple(int(c * 255) for c in gs.stroke_color) + (
                int(255 * gs.stroke_alpha),
            )
            from .content import mat_scale_of

            lw = max(1, int(round(gs.line_width * mat_scale_of(gs.ctm))))
            mask = self._clip_mask()
            if mask is None:
                for sub in path:
                    if len(sub) >= 2:
                        self.draw.line(sub, fill=color, width=lw)
            else:
                layer = Image.new("L", (self.width, self.height), 0)
                d = ImageDraw.Draw(layer)
                for sub in path:
                    if len(sub) >= 2:
                        d.line(sub, fill=color[3], width=lw)
                from PIL import ImageChops

                layer = ImageChops.multiply(layer, mask)
                solid = Image.new("RGB", (self.width, self.height), color[:3])
                self.canvas.paste(solid, (0, 0), layer)

    # ------------------------------------------------------- clip machinery

    def _clip_mask(self) -> Image.Image | None:
        """Intersection mask of the non-rect clip stack (None when every
        active clip is rectangular — the fast common case). Cached by the
        immutable clip_paths tuple, so repeated paints under one clip pay
        the rasterization once."""
        cp = self.gs.clip_paths
        if not cp:
            return None
        cache = getattr(self, "_clipmask_cache", None)
        if cache is None:
            cache = {}
            self._clipmask_cache = cache
        m = cache.get(cp)
        if m is None:
            acc: np.ndarray | None = None
            for polys, even_odd in cp:
                if even_odd:
                    layer_np = np.zeros((self.height, self.width), bool)
                    for sub in polys:
                        one = Image.new("1", (self.width, self.height), 0)
                        ImageDraw.Draw(one).polygon(list(sub), fill=1)
                        layer_np ^= np.asarray(one, bool)
                else:
                    lay = Image.new("1", (self.width, self.height), 0)
                    d = ImageDraw.Draw(lay)
                    for sub in polys:
                        d.polygon(list(sub), fill=1)
                    layer_np = np.asarray(lay, bool)
                acc = layer_np if acc is None else (acc & layer_np)
            m = Image.fromarray(
                (acc.astype(np.uint8) * 255) if acc is not None else
                np.full((self.height, self.width), 255, np.uint8)
            )
            if len(cache) > 64:
                cache.clear()
            cache[cp] = m
        return m

    def _paint_polys(
        self, path: list[list[tuple[float, float]]], rgba: tuple, even_odd: bool
    ) -> None:
        """Polygon fill honoring the clip bbox + non-rect clip mask."""
        gs = self.gs
        mask = self._clip_mask()
        cb = gs.clip_bbox
        needs_bbox = False
        if cb is not None:
            for sub in path:
                for x, y in sub:
                    if (x < cb[0] - 0.5 or y < cb[1] - 0.5
                            or x > cb[2] + 0.5 or y > cb[3] + 0.5):
                        needs_bbox = True
                        break
                if needs_bbox:
                    break
        if mask is None and not needs_bbox:
            for sub in path:
                if len(sub) >= 3:
                    self.draw.polygon(sub, fill=rgba)
            return
        layer = Image.new("L", (self.width, self.height), 0)
        d = ImageDraw.Draw(layer)
        for sub in path:
            if len(sub) >= 3:
                d.polygon(list(sub), fill=255)
        arr = np.asarray(layer, np.uint8).copy()
        if needs_bbox:
            x0 = max(int(math.floor(cb[0])), 0)
            y0 = max(int(math.floor(cb[1])), 0)
            x1 = min(int(math.ceil(cb[2])), self.width)
            y1 = min(int(math.ceil(cb[3])), self.height)
            keep = np.zeros_like(arr)
            if x1 > x0 and y1 > y0:
                keep[y0:y1, x0:x1] = 1
            arr *= keep
        if mask is not None:
            arr = (arr.astype(np.uint16) * np.asarray(mask, np.uint8) // 255).astype(
                np.uint8
            )
        if rgba[3] < 255:
            arr = (arr.astype(np.uint16) * rgba[3] // 255).astype(np.uint8)
        solid = Image.new("RGB", (self.width, self.height), rgba[:3])
        self.canvas.paste(solid, (0, 0), Image.fromarray(arr))

    # ------------------------------------------------------------- shadings

    def on_shading(self, ops: list, res: dict) -> None:
        """`sh` paints the shading across the current clip region
        (reference fidelity via pdfium, pdf_image_tools.py:26-48)."""
        if not ops or not isinstance(ops[0], str):
            return
        shs = self.doc.resolve(res.get("Shading"))
        sh = self.doc.resolve(shs.get(ops[0])) if isinstance(shs, dict) else None
        if sh is None:
            return
        self._paint_shading(sh, self.gs.ctm, None, None)

    def _paint_shading(
        self,
        sh,
        ctm,
        region: tuple[int, int, int, int] | None,
        extra_mask: np.ndarray | None,
    ) -> None:
        from .shading import mat_invert, render_shading  # noqa: F401

        gs = self.gs
        x0, y0, x1, y1 = 0, 0, self.width, self.height
        if gs.clip_bbox is not None:
            cb = gs.clip_bbox
            x0 = max(x0, int(math.floor(cb[0])))
            y0 = max(y0, int(math.floor(cb[1])))
            x1 = min(x1, int(math.ceil(cb[2])))
            y1 = min(y1, int(math.ceil(cb[3])))
        if region is not None:
            x0, y0 = max(x0, region[0]), max(y0, region[1])
            x1, y1 = min(x1, region[2]), min(y1, region[3])
        # shading's own (shading-space) BBox further restricts the paint
        sh_dict = sh.dict if hasattr(sh, "dict") else sh
        if isinstance(sh_dict, dict):
            bb = self.doc.resolve(sh_dict.get("BBox"))
            if isinstance(bb, list) and len(bb) == 4:
                pts = [
                    mat_apply(ctm, float(self.doc.resolve(bb[0])), float(self.doc.resolve(bb[1]))),
                    mat_apply(ctm, float(self.doc.resolve(bb[2])), float(self.doc.resolve(bb[1]))),
                    mat_apply(ctm, float(self.doc.resolve(bb[2])), float(self.doc.resolve(bb[3]))),
                    mat_apply(ctm, float(self.doc.resolve(bb[0])), float(self.doc.resolve(bb[3]))),
                ]
                x0 = max(x0, int(math.floor(min(p[0] for p in pts))))
                y0 = max(y0, int(math.floor(min(p[1] for p in pts))))
                x1 = min(x1, int(math.ceil(max(p[0] for p in pts))))
                y1 = min(y1, int(math.ceil(max(p[1] for p in pts))))
        if x1 <= x0 or y1 <= y0:
            return
        out = render_shading(self.doc, sh, ctm, (x0, y0, x1, y1))
        if out is None:
            return
        rgb, alpha = out
        a = alpha * gs.fill_alpha
        mask = self._clip_mask()
        if mask is not None:
            a = a * (
                np.asarray(mask, np.uint8)[y0:y1, x0:x1].astype(np.float64) / 255.0
            )
        if extra_mask is not None:
            # extra_mask is sized to the CALLER's region; the shading's
            # own BBox may have shrunk the paint window further — slice
            # to the final window so shapes always agree
            if region is not None and extra_mask.shape != a.shape:
                oy, ox = region[1], region[0]
                extra_mask = extra_mask[
                    y0 - oy : y1 - oy, x0 - ox : x1 - ox
                ]
            a = a * extra_mask
        am = Image.fromarray((np.clip(a, 0.0, 1.0) * 255).astype(np.uint8), "L")
        self.canvas.paste(Image.fromarray(rgb, "RGB"), (x0, y0), am)

    def _fill_with_pattern(
        self, path: list[list[tuple[float, float]]], even_odd: bool
    ) -> None:
        """Fill polygons with the active shading/tiling pattern."""
        kind, payload, matrix = self.gs.fill_pattern
        xs = [p[0] for sub in path for p in sub]
        ys = [p[1] for sub in path for p in sub]
        if not xs:
            return
        rx0 = max(int(math.floor(min(xs))), 0)
        ry0 = max(int(math.floor(min(ys))), 0)
        rx1 = min(int(math.ceil(max(xs))), self.width)
        ry1 = min(int(math.ceil(max(ys))), self.height)
        cb = self.gs.clip_bbox
        if cb is not None:  # rect clip applies to pattern fills too
            rx0 = max(rx0, int(math.floor(cb[0])))
            ry0 = max(ry0, int(math.floor(cb[1])))
            rx1 = min(rx1, int(math.ceil(cb[2])))
            ry1 = min(ry1, int(math.ceil(cb[3])))
        if rx1 <= rx0 or ry1 <= ry0:
            return
        poly = Image.new("L", (self.width, self.height), 0)
        d = ImageDraw.Draw(poly)
        for sub in path:
            if len(sub) >= 3:
                d.polygon(list(sub), fill=255)
        poly_np = (
            np.asarray(poly, np.uint8)[ry0:ry1, rx0:rx1].astype(np.float64) / 255.0
        )
        mask0 = self._clip_mask()
        if mask0 is not None:
            poly_np = poly_np * (
                np.asarray(mask0, np.uint8)[ry0:ry1, rx0:rx1].astype(
                    np.float64
                ) / 255.0
            )
        base = getattr(self, "_base_ctm", self.gs.ctm)
        pat_ctm = mat_mul(matrix, base)
        if kind == "shading":
            self._paint_shading(payload, pat_ctm, (rx0, ry0, rx1, ry1), poly_np)
            return
        tile = self._tiling_tile(payload, pat_ctm)
        if tile is None:
            # unsupported tiling geometry: flat mid-gray through the mask
            solid = Image.new("RGB", (rx1 - rx0, ry1 - ry0), (128, 128, 128))
            am = Image.fromarray((poly_np * 255).astype(np.uint8), "L")
            self.canvas.paste(solid, (rx0, ry0), am)
            return
        tile_img, tx0, ty0, stepx, stepy = tile
        tw, th = tile_img.size
        if stepx <= 0 or stepy <= 0:
            return
        # tile anchored at the pattern-space origin: first index covering
        # the region
        i0 = int(math.floor((rx0 - tx0) / stepx))
        j0 = int(math.floor((ry0 - ty0) / stepy))
        i1 = int(math.ceil((rx1 - tx0) / stepx))
        j1 = int(math.ceil((ry1 - ty0) / stepy))
        if (i1 - i0) * (j1 - j0) > 4096:
            return  # degenerate step: avoid pathological loops
        comb = poly_np  # clip masks already folded in above
        region_mask = Image.fromarray((comb * 255).astype(np.uint8), "L")
        # compose the pattern layer for the region then paste once
        layer = Image.new("RGBA", (rx1 - rx0, ry1 - ry0), (0, 0, 0, 0))
        for j in range(j0, j1 + 1):
            for i in range(i0, i1 + 1):
                px = int(round(tx0 + i * stepx)) - rx0
                py = int(round(ty0 + j * stepy)) - ry0
                if px > layer.width or py > layer.height:
                    continue
                if px + tw < 0 or py + th < 0:
                    continue
                layer.paste(tile_img, (px, py), tile_img)
        lnp = np.asarray(layer)
        la = (lnp[..., 3].astype(np.float64) / 255.0) * comb
        am = Image.fromarray((np.clip(la, 0, 1) * 255).astype(np.uint8), "L")
        self.canvas.paste(
            Image.fromarray(lnp[..., :3], "RGB"), (rx0, ry0), am
        )
        _ = region_mask  # (kept for clarity; comb already folded in)

    def _tiling_tile(self, pat_stream, pat_ctm):
        """Rasterize one tiling-pattern cell to an RGBA tile.

        Returns (tile_img, origin_x, origin_y, step_dx, step_dy) in device
        pixels, or None when the pattern's step vectors are not axis-
        aligned (falls back to flat fill)."""
        doc = self.doc
        pd = pat_stream.dict if hasattr(pat_stream, "dict") else None
        if not isinstance(pd, dict):
            return None
        if self._form_depth >= self.MAX_FORM_DEPTH:
            return None  # pattern-in-pattern recursion guard
        cache = getattr(self, "_tile_cache", None)
        if cache is None:
            cache = {}
            self._tile_cache = cache
        key = (id(pat_stream), tuple(round(v, 3) for v in pat_ctm))
        if key in cache:
            return cache[key]
        try:
            bb = [float(doc.resolve(v)) for v in doc.resolve(pd.get("BBox"))]
            xstep = float(doc.resolve(pd.get("XStep", bb[2] - bb[0])) or (bb[2] - bb[0]))
            ystep = float(doc.resolve(pd.get("YStep", bb[3] - bb[1])) or (bb[3] - bb[1]))
        except (TypeError, ValueError, IndexError):
            cache[key] = None
            return None
        a, b, c, d_, e, f = pat_ctm
        # axis-aligned requirement: step vectors map to axis-aligned
        # device vectors
        sx_dev = (xstep * a, xstep * b)
        sy_dev = (ystep * c, ystep * d_)
        if abs(sx_dev[1]) > 0.01 * abs(sx_dev[0] or 1) or abs(
            sy_dev[0]
        ) > 0.01 * abs(sy_dev[1] or 1):
            cache[key] = None
            return None
        corners = [
            mat_apply(pat_ctm, bb[0], bb[1]), mat_apply(pat_ctm, bb[2], bb[1]),
            mat_apply(pat_ctm, bb[2], bb[3]), mat_apply(pat_ctm, bb[0], bb[3]),
        ]
        tx0 = min(p[0] for p in corners)
        ty0 = min(p[1] for p in corners)
        tw = max(1, int(math.ceil(max(p[0] for p in corners) - tx0)))
        th = max(1, int(math.ceil(max(p[1] for p in corners) - ty0)))
        if tw > 2048 or th > 2048:
            cache[key] = None
            return None
        # nested rasterizer onto a transparent RGBA cell; inherit the
        # form depth so mutually-referencing patterns cannot recurse
        # past MAX_FORM_DEPTH
        sub = PageRasterizer(self.page, scale=self.scale)
        sub._form_depth = self._form_depth + 1
        sub.canvas = Image.new("RGBA", (tw, th), (0, 0, 0, 0))
        sub.draw = ImageDraw.Draw(sub.canvas, "RGBA")
        sub.width, sub.height = tw, th
        sub.gs.ctm = mat_mul(pat_ctm, (1, 0, 0, 1, -tx0, -ty0))
        try:
            pres = doc.resolve(pd.get("Resources")) or {}
            sub.execute(doc.stream_bytes(pat_stream), pres)
            tile = sub.canvas
        except Exception:
            cache[key] = None
            return None
        out = (tile, tx0, ty0, abs(sx_dev[0]), abs(sy_dev[1]))
        cache[key] = out
        return out

    def on_show_char(
        self, code: int, text: str, trm: Matrix, advance: float, font: Font
    ) -> None:
        gs = self.gs
        if gs.render_mode in (3, 7):  # invisible / clip-only
            return
        if getattr(font, "subtype", "") == "Type3":
            # Type3 glyphs ARE content streams; execute them under
            # FontMatrix x trm (the reference gets this from pdfium).
            # Fall through to the unicode fallback-font path when the
            # glyph program is missing/unresolvable so the text doesn't
            # silently vanish.
            if self._draw_type3(code, font, trm):
                return
        if not text or text.isspace():
            return
        a, b, c, d, e, f = trm
        # (scale, rotation, color, face-size) depend only on the linear
        # part of trm and the fill state — constant across a text run and
        # usually across the whole page. One dict hit replaces hypot +
        # atan2 + color quantization + two face lookups per char.
        rkey = (a, b, c, d, gs.fill_color, gs.fill_alpha, id(font))
        run = self._run_cache.get(rkey)
        if run is None:
            px = math.hypot(c, d)
            if px < 1.0:
                run = (None, 0.0, None)
            else:
                color = tuple(int(v * 255) for v in gs.fill_color) + (
                    int(255 * gs.fill_alpha),
                )
                rotation = math.degrees(math.atan2(b, a)) % 360.0
                upright = rotation < 0.5 or rotation > 359.5
                run = (color, rotation if not upright else 0.0, px)
            if len(self._run_cache) > 4096:
                self._run_cache.clear()
            self._run_cache[rkey] = run
        color, rotation, px = run
        if color is None:
            return
        face = self._pick_face(font, text, px)
        if face is None:
            return
        if rotation == 0.0:
            self._draw_cached(text, face, color, (e, f))
        else:
            self._draw_rotated(text, face, color, (e, f), rotation)

    def _draw_type3(self, code: int, font: Font, trm: Matrix) -> bool:
        """Execute a Type3 glyph's CharProc content stream under
        FontMatrix x trm (trm already carries font size + ctm). Returns
        False when the glyph program can't be resolved, so the caller
        can fall back to the unicode fallback-font path."""
        from dataclasses import replace

        procs = getattr(font, "t3_charprocs", None)
        if not procs:
            return False
        name = font._differences.get(code)
        if name is None:
            return False
        stream = self.doc.resolve(procs.get(name))
        if stream is None or not hasattr(stream, "dict"):
            return False
        if self._form_depth >= self.MAX_FORM_DEPTH:
            return True  # depth-guarded: don't double-draw via fallback
        self._form_depth += 1
        saved_gs = replace(self.gs)
        saved_len = len(self.gs_stack)
        # CharProcs may legally contain BT/ET (glyphs that show text):
        # the full text state must restore, not just gs
        saved_tm = self.text_matrix
        saved_tlm = self.text_line_matrix
        try:
            self.gs.ctm = mat_mul(
                getattr(font, "t3_matrix", (0.001, 0, 0, 0.001, 0, 0)), trm
            )
            res = getattr(font, "t3_resources", None) or self.page.resources
            cache = getattr(self.doc, "_form_tokens_cache", None)
            if cache is None:
                cache = {}
                self.doc._form_tokens_cache = cache
            toks = cache.get(id(stream))
            if toks is None:
                from .content import tokenize_content

                toks = list(tokenize_content(self.doc.stream_bytes(stream)))
                if len(cache) > 512:
                    cache.clear()
                cache[id(stream)] = toks
            self.execute(b"", res, tokens=toks)
        except Exception:
            pass
        finally:
            self.gs = saved_gs
            del self.gs_stack[saved_len:]
            self.text_matrix = saved_tm
            self.text_line_matrix = saved_tlm
            self._form_depth -= 1
        return True

    def _draw_cached(self, text, face, color, origin) -> None:
        """Glyph-tile cache: FreeType renders each (face, text, color)
        once; repeats paste the cached RGBA tile (per-char rendering is
        ~75% of page raster time without this)."""
        key = (id(face), text, color)
        entry = self._glyph_cache.get(key)
        if entry is None:
            try:
                bbox = face.getbbox(text, anchor="ls")
            except Exception:
                bbox = None
            if not bbox:
                return
            w, h = bbox[2] - bbox[0], bbox[3] - bbox[1]
            if w <= 0 or h <= 0 or w > 2048 or h > 2048:
                return
            tile = Image.new("RGBA", (w, h), (0, 0, 0, 0))
            ImageDraw.Draw(tile).text(
                (-bbox[0], -bbox[1]), text, font=face, fill=color, anchor="ls"
            )
            tile.load()
            if len(self._glyph_cache) > 20000:
                self._glyph_cache.clear()
            entry = (tile.im, bbox[0], bbox[1], w, h, tile)
            self._glyph_cache[key] = entry
        tile_im, dx, dy, w, h, tile = entry
        x, y = origin
        x0, y0 = int(x + dx), int(y + dy)
        if 0 <= x0 and 0 <= y0 and x0 + w <= self.width and y0 + h <= self.height:
            # core-level paste: skips the Python-side mode/box normalization
            # of Image.paste, which is pure overhead for pre-sized RGBA tiles
            self.canvas.im.paste(tile_im, (x0, y0, x0 + w, y0 + h), tile_im)
        else:  # partially off-canvas: Image.paste clips
            self.canvas.paste(tile, (x0, y0), tile)

    def _pick_face(self, font: Font, text: str, px: float):
        px_r = round(px)
        pick_key = (id(font), text[:1], px_r)
        face = self._face_picks.get(pick_key)
        if face is not None:
            return face
        face = self.fontbank.face(font, px_r)
        key = (id(font), text[:1])
        covered = self._font_covers.get(key)
        if covered is None:
            covered = self.fontbank.covers(face, text)
            self._font_covers[key] = covered
        if not covered:
            face = self.fontbank.fallback(px_r)
        self._face_picks[pick_key] = face
        return face

    def _draw_rotated(self, text, face, color, origin, rotation) -> None:
        # rotated glyph tiles repeat as much as upright ones (vertical CJK
        # runs, rotated pages): cache the render+rotate per
        # (face, text, color, rotation)
        key = (id(face), text, color, round(rotation, 2))
        rotated = self._rot_cache.get(key)
        if rotated is None:
            try:
                bbox = face.getbbox(text)
            except Exception:
                return
            if bbox is None:
                return
            pad = 4
            w = bbox[2] - bbox[0] + 2 * pad
            h = bbox[3] - bbox[1] + 2 * pad
            if w <= 0 or h <= 0 or w > 4096 or h > 4096:
                return
            tile = Image.new("RGBA", (w, h), (0, 0, 0, 0))
            td = ImageDraw.Draw(tile)
            td.text(
                (pad - bbox[0], pad - bbox[1]), text, font=face, fill=color
            )
            # device space is y-down: a +θ text rotation appears as -θ
            rotated = tile.rotate(-rotation, expand=True, resample=Image.BICUBIC)
            if len(self._rot_cache) > 8192:
                self._rot_cache.clear()
            self._rot_cache[key] = rotated
        # place so the glyph origin lands at `origin`
        ox, oy = origin
        self.canvas.paste(
            rotated,
            (int(ox - rotated.width / 2), int(oy - rotated.height / 2)),
            rotated,
        )

    def on_draw_image(self, stream: Stream, name: str) -> None:
        img = None
        try:
            img = xobject_to_pil(self.doc, stream)
        except Exception:
            img = None
        ctm = self.gs.ctm
        # unit square corners under CTM
        corners = [
            mat_apply(ctm, 0, 0), mat_apply(ctm, 1, 0),
            mat_apply(ctm, 1, 1), mat_apply(ctm, 0, 1),
        ]
        xs = [p[0] for p in corners]
        ys = [p[1] for p in corners]
        x0, y0, x1, y1 = min(xs), min(ys), max(xs), max(ys)
        if self.gs.clip_bbox:
            cb = self.gs.clip_bbox
            x0, y0 = max(x0, cb[0]), max(y0, cb[1])
            x1, y1 = min(x1, cb[2]), min(y1, cb[3])
        dst_w, dst_h = int(round(x1 - x0)), int(round(y1 - y0))
        if dst_w <= 0 or dst_h <= 0:
            return
        if img is None:
            return  # unsupported codec: leave background
        if img.mode == "LA":  # stencil mask: paint fill color through mask
            color = tuple(int(v * 255) for v in self.gs.fill_color)
            mask = img.getchannel("L").resize((dst_w, dst_h))
            mask = self._with_clip_mask((int(x0), int(y0)), mask)
            solid = Image.new("RGB", (dst_w, dst_h), color)
            self.canvas.paste(solid, (int(x0), int(y0)), mask)
            return
        a, b, c, d, _, _ = ctm
        flip_x = a < 0
        flip_y = d > 0  # PDF images are top-down after our y-flip base ctm
        if flip_x:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        if flip_y:
            img = img.transpose(Image.FLIP_TOP_BOTTOM)
        rot = math.degrees(math.atan2(b, a)) % 360.0
        if 45 <= rot < 135 or 225 <= rot < 315:
            img = img.rotate(-rot, expand=True)
        if (dst_w, dst_h) != img.size:
            # this resize dominates scanned-page raster time; cv2 is
            # ~2.4x faster than PIL BILINEAR on big strips (INTER_AREA
            # when downscaling for PIL-like anti-aliasing, INTER_LINEAR
            # when upscaling)
            if img.mode in ("RGB", "L") and dst_w * dst_h >= 16384:
                import cv2

                interp = (
                    cv2.INTER_AREA
                    if dst_w * dst_h < img.size[0] * img.size[1]
                    else cv2.INTER_LINEAR
                )
                img = Image.fromarray(
                    cv2.resize(
                        np.asarray(img), (dst_w, dst_h), interpolation=interp
                    )
                )
            else:
                img = img.resize((dst_w, dst_h), Image.BILINEAR)
        if img.mode == "RGBA":
            pmask = self._with_clip_mask(
                (int(x0), int(y0)), img.getchannel("A")
            )
            self.canvas.paste(img, (int(x0), int(y0)), pmask)
        else:
            if img.mode != "RGB":
                img = img.convert("RGB")
            pmask = self._with_clip_mask((int(x0), int(y0)), None, img.size)
            self.canvas.paste(img, (int(x0), int(y0)), pmask)

    def _with_clip_mask(
        self,
        origin: tuple[int, int],
        alpha: Image.Image | None,
        size: tuple[int, int] | None = None,
    ) -> Image.Image | None:
        """Combine a paste alpha with the non-rect clip mask at `origin`;
        None = unmasked paste (no non-rect clip and no alpha)."""
        mask = self._clip_mask()
        if mask is None:
            return alpha
        w, h = alpha.size if alpha is not None else (size or (0, 0))
        if w <= 0 or h <= 0:
            return alpha
        ox, oy = origin
        crop = mask.crop((ox, oy, ox + w, oy + h))
        if alpha is None:
            return crop
        arr = (
            np.asarray(alpha, np.uint16) * np.asarray(crop, np.uint16) // 255
        ).astype(np.uint8)
        return Image.fromarray(arr, "L")


def render_page(page: PdfPage, dpi: int = 200) -> Image.Image:
    return PageRasterizer(page, scale=dpi / 72.0).render()


class _RenderAndExtract(PageRasterizer):
    """One content-stream pass producing the raster, the char records,
    and the image placements (txt-mode pages previously interpreted
    every content stream three times)."""

    def __init__(self, page: PdfPage, scale: float, with_text: bool = True):
        super().__init__(page, scale)
        self.chars: list[dict] = []
        self.image_boxes: list[list[float]] = []
        self._rec_cache: dict = {}
        self._record_char = None
        if with_text:
            from .text import record_char

            self._record_char = record_char

    def on_show_char(self, code, text, trm, advance, font) -> None:
        if self._record_char is not None:
            self._record_char(
                self.chars, self.gs, code, text, trm, advance, font,
                self._rec_cache,
            )
        super().on_show_char(code, text, trm, advance, font)

    def on_draw_image(self, stream: Stream, name: str) -> None:
        # placement record (raster pixels; rescaled to page points by
        # render_page_full) — same unit-square math as
        # placements.PlacementCollector
        ctm = self.gs.ctm
        pts = [
            mat_apply(ctm, x, y) for x, y in ((0, 0), (1, 0), (1, 1), (0, 1))
        ]
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        self.image_boxes.append([min(xs), min(ys), max(xs), max(ys)])
        super().on_draw_image(stream, name)


def render_page_full(
    page: PdfPage, dpi: int = 200, with_text: bool = True
) -> tuple[Image.Image, dict | None, list[list[float]]]:
    """(raster, native-text page dict, image placement boxes) from ONE
    interpreter pass. The text dict matches text.get_page and the boxes
    match placements.image_placements (top-left page points).
    with_text=False skips char recording + span building (ocr-mode
    callers discard the text dict; the per-char record work is ~1/3 of
    text-page raster time) and returns None for the page dict."""
    scale = dpi / 72.0
    r = _RenderAndExtract(page, scale, with_text=with_text)
    img = r.render()
    # char/box geometry was recorded at raster scale; back to page points
    inv = 1.0 / scale
    for ch in r.chars:
        ch["bbox"] = [v * inv for v in ch["bbox"]]
        ch["origin"] = [v * inv for v in ch["origin"]]
        ch["size"] *= inv
    boxes = []
    for b in r.image_boxes:
        pb = [v * inv for v in b]
        if pb[2] - pb[0] >= 1 and pb[3] - pb[1] >= 1:
            boxes.append(pb)
    if not with_text:
        return img, None, boxes
    from .text import build_page_dict

    return img, build_page_dict(page, r.chars), boxes


def render_page_with_text(
    page: PdfPage, dpi: int = 200
) -> tuple[Image.Image, dict]:
    """(raster, native-text page dict) — see render_page_full."""
    img, page_dict, _ = render_page_full(page, dpi)
    return img, page_dict


def render_pdf_page(pdf_bytes: bytes, index: int, dpi: int = 200) -> Image.Image:
    doc = PdfDocument(pdf_bytes)
    return render_page(doc.get_page(index), dpi=dpi)
