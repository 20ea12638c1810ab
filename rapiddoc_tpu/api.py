"""RapidDoc facade: the public parse API.

API-compatible with the reference facade
(reference: rapid_doc/main.py RapidDoc.__init__/__call__/warmup,
RapidDocOutput): normalize inputs (path/bytes/URL/image/office), classify
txt vs ocr, process pages in streaming windows, emit
markdown/middle_json/content_list + images via writers.
"""
from __future__ import annotations

import base64
import os
import re
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Iterable

import numpy as np
from PIL import Image

from . import pdfio
from .config import (
    formula_enable_default,
    get_pdf_render_dpi,
    get_processing_window_size,
    table_enable_default,
)
from .data.io import (
    DataWriter,
    FanoutDataWriter,
    FileBasedDataWriter,
    MemoryDataWriter,
)
from .pipeline.middle import result_to_middle_json
from .pipeline.mkcontent import union_make
from .pipeline.scheduler import DocumentAnalyzer
from .types import MakeMode
from .utils.logging import get_logger
from .utils.trace import GLOBAL_TRACER, stage_timer

logger = get_logger("rapiddoc_tpu.api")

image_suffixes = (".png", ".jpg", ".jpeg", ".webp", ".gif", ".bmp")
office_suffixes = (".docx", ".pptx", ".xlsx")
old_office_suffixes = (".doc", ".ppt", ".xls")


class NamedBytes(bytes):
    """In-memory document bytes carrying a filename, so suffix-based
    routing (legacy .doc/.ppt/.xls, office, images) works for uploads
    that never touch disk (reference: docker/app.py passes
    UploadFile.filename through to do_parse)."""

    name: str

    def __new__(cls, data: bytes, name: str = "document"):
        obj = super().__new__(cls, data)
        obj.name = name
        return obj


@dataclass
class RapidDocOutput:
    markdown: str = ""
    images: dict[str, bytes] = field(default_factory=dict)
    middle_json: dict[str, Any] | None = None
    content_list_json: list[Any] | None = None
    # raw per-page model output ({"layout_dets": [...]} each), the
    # reference's *_model.json (None for office docs)
    model_json: list[dict] | None = None
    # per-stage {total_s, items, calls, ms_per_item} (render/layout/ocr/
    # formula/table/assembly), cumulative for this process
    stage_report: dict[str, dict] | None = None

    def __iter__(self):
        yield self.markdown
        yield self.images


class ModelStack:
    """Lazily-built model singleton, keyed by config."""

    _instances: dict[tuple, "ModelStack"] = {}

    def __init__(self, lang: str, formula_enable: bool, table_enable: bool,
                 configs: dict):
        from .models.registry import build_analyzer

        self.analyzer = build_analyzer(
            lang=lang,
            formula_enable=formula_enable,
            table_enable=table_enable,
            configs=configs,
        )

    # env that changes what build_analyzer produces — part of the cache
    # identity, else a stack built under e.g. RAPIDDOC_DISABLE_OCR=1
    # would be silently reused after the flag is cleared
    _ENV_KEYS = (
        "DISABLE_OCR", "DISABLE_LAYOUT", "DISABLE_FORMULA", "DISABLE_TABLE",
        "DEMO_LAYOUT", "MODELS_DIR", "CONTRAST_STRETCH",
        # registry.py gates the orientation classifier through the
        # prefixed lookup (env_bool), so the prefixed spelling must be
        # part of the identity too — not just the raw unprefixed form
        "USE_DOC_ORIENTATION_CLASSIFY",
    )

    @classmethod
    def _env_fingerprint(cls) -> tuple:
        from .config import env_str

        return tuple(env_str(k) for k in cls._ENV_KEYS) + (
            os.environ.get("USE_DOC_ORIENTATION_CLASSIFY"),
        )

    @classmethod
    def get(cls, lang: str, formula_enable: bool, table_enable: bool,
            configs: dict | None = None) -> "ModelStack":
        key = (lang, formula_enable, table_enable,
               repr(sorted((configs or {}).items())), cls._env_fingerprint())
        if key not in cls._instances:
            cls._instances[key] = cls(lang, formula_enable, table_enable, configs or {})
        return cls._instances[key]


class RapidDoc:
    def __init__(
        self,
        layout_config: dict[str, Any] | None = None,
        ocr_config: dict[str, Any] | None = None,
        formula_config: dict[str, Any] | None = None,
        table_config: dict[str, Any] | None = None,
        checkbox_config: dict[str, Any] | None = None,
        image_config: dict[str, Any] | None = None,
        parse_method: str = "auto",
        formula_enable: bool = True,
        table_enable: bool = True,
        lang: str = "ch",
        make_md_mode: str = MakeMode.MM_MD,
        output_dir: str | Path | None = None,
        image_writer: DataWriter | None = None,
        md_writer: DataWriter | None = None,
        image_dir_name: str = "images",
        image_output_mode: str = "url",
        preload_model: bool = False,
        pdf_pages_batch: int | None = None,
        checkpoint_dir: str | Path | None = None,
    ) -> None:
        self.layout_config = layout_config or {}
        self.ocr_config = ocr_config or {}
        self.formula_config = formula_config or {}
        self.table_config = table_config or {}
        self.checkbox_config = checkbox_config or {}
        self.image_config = image_config or {}
        self.parse_method = parse_method
        self.formula_enable = formula_enable_default(formula_enable)
        self.table_enable = table_enable_default(table_enable)
        self.lang = lang
        self.make_md_mode = make_md_mode
        self.default_output_dir = output_dir
        self.default_image_writer = image_writer
        self.default_md_writer = md_writer
        self.image_dir_name = image_dir_name or "images"
        if image_output_mode not in ("url", "data_uri"):
            raise ValueError("image_output_mode must be 'url' or 'data_uri'")
        self.image_output_mode = image_output_mode
        self.pdf_pages_batch = (
            pdf_pages_batch if pdf_pages_batch is not None
            else get_processing_window_size()
        )
        # neither the ctor arg nor the env pinned a window: the parse
        # loop may shrink it per document so the render/compute/assembly
        # pipeline has >= 3 windows of depth (overlap needs stages to
        # coexist; one giant window serializes them)
        from .config import env_str as _env_str

        self._window_auto = (
            pdf_pages_batch is None
            and _env_str("PROCESSING_WINDOW_SIZE") is None
        )
        self.checkpoint_dir = checkpoint_dir
        if preload_model:
            self.warmup()

    # -------------------------------------------------------------- warmup

    def warmup(self, lang: str | None = None, formula_enable: bool | None = None,
               table_enable: bool | None = None, precompile: bool = False) -> None:
        """Build the model stack; with `precompile`, also run dummy
        batches so the common XLA programs compile before the first
        request (first compile on TPU takes minutes — a serving process
        should pay that at startup, not on a user's document)."""
        stack = ModelStack.get(
            lang or self.lang,
            self.formula_enable if formula_enable is None else formula_enable,
            self.table_enable if table_enable is None else table_enable,
            {
                "layout": self.layout_config,
                "ocr": self.ocr_config,
                "formula": self.formula_config,
                "table": self.table_config,
                "checkbox": self.checkbox_config,
            },
        )
        if not precompile:
            return
        an = stack.analyzer
        blank = np.full((1056, 816, 3), 255, np.uint8)  # letter @ ~100dpi-ish
        try:
            if an.layout_model is not None:
                an.layout_model.batch_predict([blank] * 8)
            if an.ocr is not None:
                an.ocr([blank])
        except Exception:
            logger.exception("warmup precompile failed (continuing)")

    # ---------------------------------------------------------------- call

    def __call__(
        self,
        inputs: str | bytes | Path | Iterable,
        output_dir: str | Path | None = None,
        **overrides: Any,
    ) -> RapidDocOutput | list[RapidDocOutput]:
        if isinstance(inputs, (bytearray, memoryview)):
            inputs = bytes(inputs)
        if isinstance(inputs, (str, bytes, Path)) or isinstance(
            inputs, (Image.Image, np.ndarray)
        ):
            # note: ndarray/PIL must dispatch BEFORE the iterable branch
            # (an HxWx3 array is iterable row-wise)
            return self._parse_single(inputs, output_dir, **overrides)
        if output_dir is None and not overrides:
            # multi-document calls batch pages across documents by default
            return self.parse_batch(inputs)
        return [self._parse_single(item, output_dir, **overrides) for item in inputs]

    def _parse_single(
        self, item: str | bytes | Path, output_dir: str | Path | None, **overrides
    ) -> RapidDocOutput:
        pdf_bytes, name, kind = self._normalize_input(item)
        if kind == "office":
            from .office.analyze import office_parse

            return office_parse(
                pdf_bytes, name, make_md_mode=self.make_md_mode,
                image_output_mode=self.image_output_mode,
            )
        return self._parse_pipeline(pdf_bytes, name, output_dir, **overrides)

    # ------------------------------------------------------------ pipeline

    def _parse_pipeline(
        self, pdf_bytes: bytes, name: str, output_dir: str | Path | None,
        **overrides,
    ) -> RapidDocOutput:
        parse_method = overrides.get("parse_method", self.parse_method)
        if parse_method == "auto":
            parse_method = pdfio.classify_pdf(pdf_bytes)
        logger.info("parsing %s as %s", name, parse_method)

        mem_writer = MemoryDataWriter(self.image_dir_name)
        writers: list[DataWriter] = [mem_writer]
        out_dir = output_dir or self.default_output_dir
        if out_dir:
            img_dir = Path(out_dir) / name / self.image_dir_name
            writers.append(FileBasedDataWriter(str(img_dir)))
        if self.default_image_writer is not None:
            writers.append(self.default_image_writer)
        image_writer = FanoutDataWriter(*writers)

        stack = ModelStack.get(
            overrides.get("lang", self.lang),
            self.formula_enable, self.table_enable,
            {
                "layout": self.layout_config,
                "ocr": self.ocr_config,
                "formula": self.formula_config,
                "table": self.table_config,
                "checkbox": self.checkbox_config,
            },
        )

        doc = pdfio.open_pdf(pdf_bytes)
        n_pages = len(doc)
        dpi = get_pdf_render_dpi()
        scale = dpi / 72.0
        window = max(1, self.pdf_pages_batch)
        if self._window_auto and n_pages > 16:
            # pipeline depth >= 3 windows lets render(N+1) and
            # assembly(N-1) hide under device compute of window N.
            # Floor of 16: smaller windows fragment device batches and
            # multiply per-call dispatch overhead — measured 3.54 ->
            # 1.70 pages/sec at window=4 on the 12-page bench, which
            # costs far more than the host overlap wins. Short docs run
            # as ONE window; the pipeline engages on long documents
            # where per-window fixed costs amortize.
            import math as _math

            window = min(window, max(16, _math.ceil(n_pages / 3)))

        all_model_infos: list[dict] = []
        page_dims: list[tuple[float, float]] = []
        scales: list[float] = []
        page_imgs: list[Image.Image] = []
        text_dicts: list[dict | None] = []
        parse_modes: list[str] = []

        def render_window(start: int):
            """Render one window of pages (host work, overlappable).

            Large windows fan out across a process pool (the pure-Python
            rasterizer is GIL-bound; reference: pdf_image_tools.py:56-155
            process-pool render) with a serial fallback."""
            idxs = list(range(start, min(start + window, n_pages)))
            from .pdfio.parallel_render import (
                concurrency_enabled,
                render_pages_parallel,
            )

            if concurrency_enabled(len(idxs)):
                try:
                    with stage_timer("render", len(idxs)):
                        items = render_pages_parallel(
                            pdf_bytes, idxs, dpi, parse_method == "txt"
                        )
                    w_imgs, w_text, w_boxes, dims = [], [], [], []
                    for item in items:
                        if item is None:
                            w_imgs.append(
                                Image.new("RGB", (int(612 * scale),
                                                  int(792 * scale)), "white")
                            )
                            w_text.append(None)
                            w_boxes.append([])
                            dims.append((612.0, 792.0))
                        else:
                            img, size, tdict, boxes = item
                            w_imgs.append(img)
                            w_text.append(tdict)
                            w_boxes.append(boxes)
                            dims.append(size)
                    return w_imgs, w_text, w_boxes, dims
                except Exception:
                    logger.exception(
                        "parallel render failed; falling back to serial"
                    )
            w_imgs, w_text, w_boxes, dims = [], [], [], []
            with stage_timer("render", len(idxs)):
                for i in idxs:
                    try:
                        page = doc.get_page(i)
                        # one interpreter pass yields raster + text +
                        # image placements (was three passes)
                        from .pdfio.render import render_page_full

                        img, tdict, boxes = render_page_full(
                            page, dpi=dpi,
                            with_text=(parse_method == "txt"),
                        )
                        dims.append(page.size)
                    except Exception:
                        # per-page failure isolation: blank placeholder
                        logger.exception("page %d failed to render", i)
                        img = Image.new("RGB", (int(612 * scale), int(792 * scale)),
                                        "white")
                        tdict, boxes = None, []
                        dims.append((612.0, 792.0))
                    w_imgs.append(img)
                    w_text.append(tdict)
                    w_boxes.append(boxes)
            return w_imgs, w_text, w_boxes, dims

        # three-stage window pipeline: render window N+1 on a prefetch
        # thread AND assemble window N-1 on an assembly thread while the
        # device chews window N (reference only overlaps render, via a
        # process pool, main.py:294-368; assembly there is fully serial)
        from concurrent.futures import ThreadPoolExecutor

        from .pipeline.middle import build_page_infos, finalize_middle_json
        from .utils.checkpoint import resolve_checkpoint

        ckpt = resolve_checkpoint(
            self.checkpoint_dir, pdf_bytes, parse_method, dpi, window
        )
        want_originals = bool(self.image_config.get("extract_original_image"))
        starts = list(range(0, n_pages, window))

        def assemble_window(start, infos, dims, w_imgs, w_text, originals):
            with stage_timer("assembly", len(infos)):
                return build_page_infos(
                    infos, dims, [scale] * len(infos),
                    page_imgs=w_imgs, page_text_dicts=w_text,
                    parse_mode=parse_method, image_writer=image_writer,
                    page_idx_offset=start,
                    originals_per_page=originals,
                    image_config=self.image_config,
                )

        # doc-wide AR packing: formula/table decode regions accumulate
        # across windows and run in FULL length x batch buckets instead
        # of per-window dribbles (a 16-slot decode bucket at 2 regions
        # wastes 7/8 of every step). Checkpointed runs keep per-window
        # decoding so saved windows stay self-contained.
        from .pipeline.scheduler import DeferredAR

        deferred = (
            DeferredAR() if (ckpt is None and len(starts) > 1) else None
        )
        asm_futures = []
        pending_asm: list[tuple] = []  # windows awaiting an AR flush

        with ThreadPoolExecutor(max_workers=1) as pool, ThreadPoolExecutor(
            max_workers=1
        ) as asm_pool:

            def submit_pending():
                for args in pending_asm:
                    asm_futures.append(asm_pool.submit(assemble_window, *args))
                pending_asm.clear()

            future = pool.submit(render_window, starts[0]) if starts else None
            for wi, start in enumerate(starts):
                w_imgs, w_text, w_boxes, dims = future.result()
                if wi + 1 < len(starts):
                    future = pool.submit(render_window, starts[wi + 1])
                infos = ckpt.load(start) if ckpt is not None else None
                if infos is None:
                    arrays = [
                        np.asarray(
                            im if im.mode == "RGB" else im.convert("RGB")
                        )
                        for im in w_imgs
                    ]
                    w_modes = [parse_method] * len(w_imgs)
                    infos = stack.analyzer.analyze_pages(
                        arrays, w_modes, w_text, w_boxes,
                        [scale] * len(w_imgs), deferred=deferred,
                    )
                    if ckpt is not None:
                        ckpt.save(start, infos)
                else:
                    logger.info("window %d resumed from checkpoint", start)
                    w_modes = [parse_method] * len(w_imgs)
                originals = (
                    _collect_original_images(
                        doc, len(w_imgs), first_page=start
                    )
                    if want_originals
                    else None
                )
                # reference image_config: image spans matching an embedded
                # image keep the ORIGINAL pixels (docs/analyze_param.md)
                args = (start, infos, dims, w_imgs, w_text, originals)
                if deferred is not None and deferred.window_added() > 0:
                    pending_asm.append(args)
                elif pending_asm:
                    # keep window order: ride behind the pending flush
                    pending_asm.append(args)
                else:
                    asm_futures.append(
                        asm_pool.submit(assemble_window, *args)
                    )
                # flush when a full decode bucket accumulated, OR when
                # deferral has stalled assembly for >= 3 windows (a
                # single early region must not hold every later window's
                # page images in memory and serialize assembly to the
                # end of the document)
                if deferred is not None and pending_asm and (
                    deferred.should_flush() or len(pending_asm) >= 3
                ):
                    stack.analyzer.flush_deferred(deferred)
                    submit_pending()
                all_model_infos.extend(infos)
                page_imgs.extend(w_imgs)
                text_dicts.extend(w_text)
                parse_modes.extend(w_modes)
                page_dims.extend(dims)
                scales.extend([scale] * len(w_imgs))
            if deferred is not None:
                stack.analyzer.flush_deferred(deferred)
            submit_pending()
            page_infos = [p for f in asm_futures for p in f.result()]

        with stage_timer("assembly_final", n_pages):
            middle_json = finalize_middle_json(page_infos, parse_method)

        img_prefix = self.image_dir_name
        markdown = union_make(middle_json["pdf_info"], self.make_md_mode, img_prefix)
        content_list = union_make(
            middle_json["pdf_info"], MakeMode.CONTENT_LIST, img_prefix
        )
        images = {
            f"{self.image_dir_name}/{k}": v for k, v in mem_writer.data.items()
        }
        if self.image_output_mode == "data_uri":
            markdown = self._embed_data_uris(markdown, images)

        if out_dir:
            md_writer = FileBasedDataWriter(str(Path(out_dir) / name))
            md_writer.write_string(f"{name}.md", markdown)
            import json

            md_writer.write_string(
                f"{name}_middle.json", json.dumps(middle_json, ensure_ascii=False,
                                                  default=str)
            )
            md_writer.write_string(
                f"{name}_content_list.json",
                json.dumps(content_list, ensure_ascii=False, default=str),
            )
        if self.default_md_writer is not None:
            self.default_md_writer.write_string(f"{name}.md", markdown)

        report = GLOBAL_TRACER.report()
        if report:
            logger.info(
                "stage ms/page: %s",
                {k: v["ms_per_item"] for k, v in report.items()},
            )
        return RapidDocOutput(
            markdown=markdown,
            images=images,
            middle_json=middle_json,
            content_list_json=content_list,
            model_json=all_model_infos,
            stage_report=report,
        )

    # -------------------------------------------------------- batch parse

    def parse_batch(self, inputs: Iterable) -> list[RapidDocOutput]:
        """Parse many documents with pages super-batched ACROSS documents
        (reference: pipeline_analyze.py:135-213 — pages of all docs flow
        into shared MINERU_MIN_BATCH_INFERENCE_SIZE batches so small
        documents don't waste device batch slots). Office documents take
        their model-free path individually. Note: per-window
        checkpointing and writer fan-out apply to the single-document
        path only; use __call__ per document when those are needed."""
        from .config import env_int

        items = list(inputs)
        outputs: list[RapidDocOutput | None] = [None] * len(items)
        docs: list[tuple[int, bytes, str]] = []  # (slot, pdf_bytes, mode)
        for slot, item in enumerate(items):
            pdf_bytes, name, kind = self._normalize_input(item)
            if kind == "office":
                from .office.analyze import office_parse

                outputs[slot] = office_parse(
                    pdf_bytes, name, make_md_mode=self.make_md_mode,
                    image_output_mode=self.image_output_mode,
                )
                continue
            mode = self.parse_method
            if mode == "auto":
                mode = pdfio.classify_pdf(pdf_bytes)
            docs.append((slot, pdf_bytes, mode))
        if not docs:
            return [o for o in outputs if o is not None] if all(
                o is not None for o in outputs
            ) else outputs  # type: ignore[return-value]

        stack = ModelStack.get(
            self.lang, self.formula_enable, self.table_enable,
            {
                "layout": self.layout_config,
                "ocr": self.ocr_config,
                "formula": self.formula_config,
                "table": self.table_config,
                "checkbox": self.checkbox_config,
            },
        )
        dpi = get_pdf_render_dpi()
        scale = dpi / 72.0
        super_batch = max(
            self.pdf_pages_batch, env_int("MIN_BATCH_INFERENCE_SIZE", 384)
        )

        opened = [(slot, pdfio.open_pdf(b), b, mode) for slot, b, mode in docs]
        tasks = [
            (k, page_i)
            for k, (_, doc, _, _) in enumerate(opened)
            for page_i in range(len(doc))
        ]
        per_doc: dict[int, dict[int, tuple]] = {k: {} for k in range(len(opened))}
        # AR regions pack across super-batch chunks too (assembly here
        # happens after all chunks, so no per-window gating is needed)
        from .pipeline.scheduler import DeferredAR

        batch_deferred = DeferredAR() if len(tasks) > super_batch else None
        for c0 in range(0, len(tasks), super_batch):
            chunk = tasks[c0 : c0 + super_batch]
            imgs, modes, tdicts, boxes_l, keys = [], [], [], [], []
            for k, page_i in chunk:
                _, doc, _, mode = opened[k]
                try:
                    page = doc.get_page(page_i)
                    from .pdfio.render import render_page_full

                    img, tdict, boxes = render_page_full(
                        page, dpi=dpi, with_text=(mode == "txt")
                    )
                    dims = page.size
                except Exception:
                    logger.exception("page %d failed to render", page_i)
                    img = Image.new(
                        "RGB", (int(612 * scale), int(792 * scale)), "white"
                    )
                    tdict, boxes, dims = None, [], (612.0, 792.0)
                imgs.append(img)
                modes.append(mode)
                tdicts.append(tdict)
                boxes_l.append(boxes)
                keys.append((k, page_i, dims))
            arrays = [np.asarray(im.convert("RGB")) for im in imgs]
            infos = stack.analyzer.analyze_pages(
                arrays, modes, tdicts, boxes_l, [scale] * len(arrays),
                deferred=batch_deferred,
            )
            if batch_deferred is not None and batch_deferred.should_flush():
                stack.analyzer.flush_deferred(batch_deferred)
            for (k, page_i, dims), info, img, tdict in zip(
                keys, infos, imgs, tdicts
            ):
                per_doc[k][page_i] = (info, dims, img, tdict)
        if batch_deferred is not None:
            stack.analyzer.flush_deferred(batch_deferred)

        for k, (slot, doc, _, mode) in enumerate(opened):
            pages = [per_doc[k][i] for i in sorted(per_doc[k])]
            mem_writer = MemoryDataWriter(self.image_dir_name)
            middle_json = result_to_middle_json(
                [p[0] for p in pages],
                [p[1] for p in pages],
                [scale] * len(pages),
                page_imgs=[p[2] for p in pages],
                page_text_dicts=[p[3] for p in pages],
                parse_mode=mode,
                image_writer=mem_writer,
            )
            img_prefix = self.image_dir_name
            markdown = union_make(
                middle_json["pdf_info"], self.make_md_mode, img_prefix
            )
            content_list = union_make(
                middle_json["pdf_info"], MakeMode.CONTENT_LIST, img_prefix
            )
            images = {
                f"{self.image_dir_name}/{n}": v
                for n, v in mem_writer.data.items()
            }
            if self.image_output_mode == "data_uri":
                markdown = self._embed_data_uris(markdown, images)
            outputs[slot] = RapidDocOutput(
                markdown=markdown,
                images=images,
                middle_json=middle_json,
                content_list_json=content_list,
                model_json=[p[0] for p in pages],
                stage_report=GLOBAL_TRACER.report(),
            )
        return outputs  # type: ignore[return-value]

    @staticmethod
    def _image_mime(data: bytes) -> str:
        """MIME type from magic bytes — office media are typically PNG
        or GIF, so a hardcoded image/jpeg would misrender in strict
        data-URI consumers."""
        if data[:8] == b"\x89PNG\r\n\x1a\n":
            return "image/png"
        if data[:6] in (b"GIF87a", b"GIF89a"):
            return "image/gif"
        if data[:2] == b"BM":
            return "image/bmp"
        if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
            return "image/webp"
        if data[:5] in (b"<?xml", b"<svg ") or data[:4] == b"<svg":
            return "image/svg+xml"
        return "image/jpeg"

    @staticmethod
    def _embed_data_uris(markdown: str, images: dict[str, bytes]) -> str:
        def repl(m: re.Match) -> str:
            path = m.group(1)
            data = images.get(path)
            if data is None:
                return m.group(0)
            b64 = base64.b64encode(data).decode()
            mime = RapidDoc._image_mime(data)
            return f"![](data:{mime};base64,{b64})"

        def repl_html(m: re.Match) -> str:
            path = m.group(1)
            data = images.get(path)
            if data is None:
                return m.group(0)
            b64 = base64.b64encode(data).decode()
            mime = RapidDoc._image_mime(data)
            return f'<img src="data:{mime};base64,{b64}"/>'

        markdown = re.sub(r"!\[\]\(([^)]+)\)", repl, markdown)
        return re.sub(r'<img src="([^"]+)"/>', repl_html, markdown)

    # --------------------------------------------------------------- input

    def _normalize_input(self, item: str | bytes | Path) -> tuple[bytes, str, str]:
        """Returns (pdf_bytes_or_office_bytes, doc_name, kind)."""
        if isinstance(item, (Image.Image, np.ndarray)):
            # in-memory image (PIL or HxWx3/HxW numpy): wrap as a
            # one-page PDF like path-based image inputs
            import io

            if not isinstance(item, Image.Image):
                item = Image.fromarray(np.asarray(item))
            buf = io.BytesIO()
            (item if item.mode in ("RGB", "L") else item.convert("RGB")).save(
                buf, format="PNG"
            )
            pdf = pdfio.images_to_pdf([buf.getvalue()], dpi=get_pdf_render_dpi())
            return pdf, "image", "pdf"
        if isinstance(item, (str, Path)):
            s = str(item)
            if s.startswith(("http://", "https://")):
                import requests
                from urllib.parse import unquote, urlparse

                resp = requests.get(s, timeout=120)
                resp.raise_for_status()
                data = resp.content
                name = os.path.basename(unquote(urlparse(s).path)) or "download"
            else:
                data = Path(s).read_bytes()
                name = Path(s).name
        else:
            data = bytes(item)
            # NamedBytes (or any bytes-like with a .name) keeps suffix
            # routing working for in-memory uploads (HTTP path)
            name = str(getattr(item, "name", "") or "document")
        stem, suffix = os.path.splitext(name)
        suffix = suffix.lower()
        stem = stem or "document"

        if suffix in office_suffixes or _sniff_office(data):
            return data, stem, "office"
        if suffix in old_office_suffixes:
            converted = _legacy_office_to_modern(data, suffix)
            return converted, stem, "office"
        if suffix in image_suffixes or _sniff_image(data):
            pdf = pdfio.images_to_pdf([data], dpi=get_pdf_render_dpi())
            return pdf, stem, "pdf"
        known = (
            image_suffixes + office_suffixes + old_office_suffixes
            + (".pdf",)
        )
        if suffix not in known and data[:4] != b"%PDF":
            # extensionless input: content-based id (trained magika via the
            # JAX ONNX interpreter when available; reference:
            # utils/guess_suffix_or_lang.py:174-193)
            from .utils.sniff import guess_suffix_by_bytes

            guessed = guess_suffix_by_bytes(data)
            if guessed in ("docx", "pptx", "xlsx"):
                return data, stem, "office"
            if guessed in ("doc", "ppt", "xls"):
                return _legacy_office_to_modern(data, f".{guessed}"), stem, "office"
            if guessed in ("png", "jpg", "gif", "webp", "bmp", "tif"):
                pdf = pdfio.images_to_pdf([data], dpi=get_pdf_render_dpi())
                return pdf, stem, "pdf"
        return data, stem, "pdf"


def _sniff_image(data: bytes) -> bool:
    return data[:4] in (b"\x89PNG", b"RIFF") or data[:3] == b"\xff\xd8\xff" or data[:6] in (
        b"GIF87a", b"GIF89a"
    )


def _sniff_office(data: bytes) -> bool:
    if data[:4] != b"PK\x03\x04":
        return False
    head = data[:4096]
    return b"word/" in head or b"ppt/" in head or b"xl/" in head


def _legacy_office_to_modern(data: bytes, suffix: str) -> bytes:
    """doc/ppt/xls -> docx/pptx/xlsx via LibreOffice when available
    (reference: rapid_doc/utils/office_converter.py:52)."""
    import shutil
    import subprocess
    import tempfile

    soffice = shutil.which("soffice") or shutil.which("libreoffice")
    if soffice is None:
        raise RuntimeError(
            "legacy office formats require LibreOffice (soffice) on PATH"
        )
    target = {".doc": "docx", ".ppt": "pptx", ".xls": "xlsx"}[suffix]
    with tempfile.TemporaryDirectory() as tmp:
        src = Path(tmp) / f"input{suffix}"
        src.write_bytes(data)
        subprocess.run(
            [soffice, "--headless", "--convert-to", target, "--outdir", tmp, str(src)],
            check=True, capture_output=True, timeout=300,
        )
        out = Path(tmp) / f"input.{target}"
        return out.read_bytes()


def _collect_original_images(doc, n_pages: int, first_page: int = 0):
    """Per page: (bbox in page units, decoded PIL) for embedded images."""
    from .pdfio.images import xobject_to_pil
    from .pdfio.placements import original_image_streams

    out = []
    for i in range(first_page, first_page + n_pages):
        items = []
        try:
            for bbox, stream in original_image_streams(doc.get_page(i)):
                img = xobject_to_pil(doc, stream)
                if img is not None:
                    items.append((bbox, img.convert("RGB")))
        except Exception:
            logger.exception("original image extraction failed on page %d", i)
        out.append(items)
    return out


def stage_report() -> dict:
    """Per-stage ms/page metrics collected during parsing."""
    return GLOBAL_TRACER.report()
