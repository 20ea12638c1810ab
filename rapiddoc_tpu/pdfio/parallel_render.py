"""Process-pool page rasterization.

Host-parallel counterpart of the reference's render fan-out (reference:
rapid_doc/utils/pdf_image_tools.py:56-155 load_images_from_pdf —
ProcessPoolExecutor x4 over page ranges with a timeout, gated by
MINERU_PDF_CONCURRENCY_ENABLED). The rasterizer here is pure Python
(GIL-bound), so multi-process is the only way to scale it; each worker
re-opens the document from bytes (documents don't pickle).
"""
from __future__ import annotations

import os
from concurrent.futures import ProcessPoolExecutor, TimeoutError as FutTimeout

from ..config import env_bool, env_int
from ..utils.logging import get_logger

logger = get_logger("rapiddoc_tpu.pdfio.parallel")

_POOL: ProcessPoolExecutor | None = None


def concurrency_enabled(n_pages: int) -> bool:
    # enabled by default on multi-core hosts (reference default); the
    # pure-Python rasterizer is GIL-bound so the pool is the only way to
    # scale it. Requires >= 2 cores and a window big enough to amortize
    # the per-worker document re-parse.
    if not env_bool("PDF_CONCURRENCY_ENABLED", True):
        return False
    return n_pages >= 16 and (os.cpu_count() or 1) >= 2


def _n_workers() -> int:
    return max(1, min(env_int("PDF_RENDER_WORKERS", 4), os.cpu_count() or 1))


def _render_range(pdf_bytes: bytes, idxs: list[int], dpi: int,
                  want_text: bool):
    """Worker: render a page range; returns per-page
    (png_bytes, (w, h) page units, text_dict|None, image_boxes)."""
    import io

    from . import open_pdf
    from .render import render_page_full

    out = []
    doc = open_pdf(pdf_bytes)
    for i in idxs:
        try:
            page = doc.get_page(i)
            # single interpreter pass: raster + text + placements
            img, tdict, boxes = render_page_full(
                page, dpi=dpi, with_text=want_text
            )
            buf = io.BytesIO()
            img.save(buf, format="PNG", compress_level=1)
            out.append((buf.getvalue(), page.size, tdict, boxes))
        except Exception:
            logger.exception("worker failed on page %d", i)
            out.append(None)
    return out


def _get_pool() -> ProcessPoolExecutor:
    global _POOL
    if _POOL is None:
        _POOL = ProcessPoolExecutor(max_workers=_n_workers())
    return _POOL


def render_pages_parallel(
    pdf_bytes: bytes, idxs: list[int], dpi: int, want_text: bool,
    timeout: float | None = None,
):
    """Render pages across worker processes. Returns a list aligned with
    idxs of (PIL.Image, (w, h), text_dict|None, image_boxes) — None for
    pages that failed. Falls back by raising on pool-level failure;
    callers keep their serial path."""
    import io

    from PIL import Image

    timeout = timeout or float(
        os.environ.get("RAPIDDOC_PDF_LOAD_IMAGES_TIMEOUT")
        or os.environ.get("MINERU_PDF_LOAD_IMAGES_TIMEOUT")
        or 300
    )
    nw = _n_workers()
    shards = [idxs[k::nw] for k in range(nw)]
    shards = [s for s in shards if s]
    pool = _get_pool()
    futures = [
        pool.submit(_render_range, pdf_bytes, shard, dpi, want_text)
        for shard in shards
    ]
    results: dict[int, tuple] = {}
    try:
        for shard, fut in zip(shards, futures):
            for i, item in zip(shard, fut.result(timeout=timeout)):
                if item is None:
                    continue
                png, size, tdict, boxes = item
                results[i] = (
                    Image.open(io.BytesIO(png)).convert("RGB"),
                    size, tdict, boxes,
                )
    except FutTimeout:
        # kill the pool so stuck workers don't leak (reference:
        # pdf_image_tools.py:151-155)
        global _POOL
        pool.shutdown(wait=False, cancel_futures=True)
        _POOL = None
        raise TimeoutError(f"page render exceeded {timeout}s")
    return [results.get(i) for i in idxs]
