"""HTTP parsing service.

API parity with the reference FastAPI server (reference:
docker/app.py:37-172 — GET /health, POST /file_parse multipart with
per-request config JSON strings, zip or JSON response). Implemented on
aiohttp (fastapi is absent from this environment); endpoint shapes and
field names match.
"""
from __future__ import annotations

import asyncio
import io
import json
import zipfile
from concurrent.futures import ThreadPoolExecutor

from ..utils.logging import get_logger
from ..version import __version__

logger = get_logger("rapiddoc_tpu.serve")

_executor = ThreadPoolExecutor(max_workers=2)


def _engine_lang(options: dict) -> str:
    # reference accepts lang_list (one per file, docker/app.py:153);
    # single-engine builds use the first entry
    lang_list = options.get("lang_list")
    if isinstance(lang_list, list) and lang_list:
        return str(lang_list[0])
    if isinstance(lang_list, str) and lang_list:
        return lang_list
    return options.get("lang", "ch")


def _page_slice(data: bytes, options: dict) -> bytes:
    """Honor start_page_id/end_page_id for PDF inputs (reference:
    docker/app.py:170-171)."""
    try:
        start = int(options.get("start_page_id", 0))
        end = int(options.get("end_page_id", 99999))
    except (TypeError, ValueError):
        return data
    if (start <= 0 and end >= 99999) or not data.lstrip()[:4] == b"%PDF":
        return data
    from .. import pdfio

    try:
        n = len(pdfio.open_pdf(data))
        return pdfio.select_pages(data, range(start, min(end, n - 1) + 1))
    except Exception:
        return data


def _build_engine(options: dict):
    from ..api import RapidDoc

    return RapidDoc(
        parse_method=options.get("parse_method", "auto"),
        lang=_engine_lang(options),
        formula_enable=options.get("formula_enable", True),
        table_enable=options.get("table_enable", True),
        layout_config=options.get("layout_config") or {},
        ocr_config=options.get("ocr_config") or {},
        formula_config=options.get("formula_config") or {},
        table_config=options.get("table_config") or {},
    )


def _result_dict(out, filename: str, options: dict) -> dict:
    """Shape one document's response by the return_* flags (reference:
    docker/app.py:164-168 defaults: md+images on, the rest off)."""
    result: dict = {"filename": filename}
    if options.get("return_md", True):
        result["markdown"] = out.markdown
    if options.get("return_middle_json", False):
        result["middle_json"] = out.middle_json
    if options.get("return_model_output", False):
        result["model_output"] = out.model_json
    if options.get("return_content_list", False):
        result["content_list"] = out.content_list_json
    if options.get("return_images", True):
        result["images"] = out.images
    else:
        result["images"] = {}
    return result


def _parse_bytes(data: bytes, filename: str, options: dict) -> dict:
    from ..api import NamedBytes

    engine = _build_engine(options)
    out = engine(NamedBytes(_page_slice(data, options), filename))
    return _result_dict(out, filename, options)


def _parse_batch_bytes(files: list[tuple[str, bytes]], options: dict) -> list[dict]:
    """Multi-file request: pages super-batched across documents
    (RapidDoc.parse_batch)."""
    from ..api import NamedBytes

    engine = _build_engine(options)
    outs = engine.parse_batch(
        [NamedBytes(_page_slice(data, options), name) for name, data in files]
    )
    return [
        _result_dict(out, name, options)
        for (name, _), out in zip(files, outs)
    ]


def _zip_response(results: list[dict]):
    """Zip archive: one directory per document (single doc at top level)."""
    from aiohttp import web

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        for result in results:
            name = result["filename"].rsplit(".", 1)[0]
            prefix = f"{name}/" if len(results) > 1 else ""
            if "markdown" in result:
                z.writestr(f"{prefix}{name}.md", result["markdown"])
            for key, suffix in (
                ("middle_json", "_middle.json"),
                ("content_list", "_content_list.json"),
                ("model_output", "_model.json"),
            ):
                if key in result:
                    z.writestr(
                        f"{prefix}{name}{suffix}",
                        json.dumps(result[key], ensure_ascii=False,
                                   default=str),
                    )
            for rel, blob in result.get("images", {}).items():
                z.writestr(prefix + rel, blob)
    archive = results[0]["filename"].rsplit(".", 1)[0] if len(results) == 1 \
        else "results"
    return web.Response(
        body=buf.getvalue(),
        content_type="application/zip",
        headers={
            "Content-Disposition": f'attachment; filename="{archive}.zip"'
        },
    )


def make_app():
    from aiohttp import web

    routes = web.RouteTableDef()

    @routes.get("/health")
    async def health(request):
        return web.json_response({"status": "ok", "version": __version__})

    @routes.get("/")
    async def index(request):
        from .webui import PAGE

        return web.Response(text=PAGE, content_type="text/html")

    @routes.post("/webui_parse")
    async def webui_parse(request):
        """Webui endpoint: parse + server-rendered markdown preview."""
        from .webui import render_preview_html

        files, options, _ = await _read_multipart(request)
        if not files:
            return web.json_response({"error": "no file uploaded"}, status=400)
        filename, file_bytes = files[0]
        loop = asyncio.get_running_loop()
        try:
            result = await loop.run_in_executor(
                _executor, _parse_bytes, file_bytes, filename, options
            )
        except Exception as e:
            logger.exception("parse failed")
            return web.json_response({"error": str(e)}, status=500)
        return web.json_response(
            {
                "markdown": result["markdown"],
                "html": render_preview_html(
                    result["markdown"], result["images"]
                ),
                "filename": filename,
            }
        )

    async def _read_multipart(request):
        """-> (files [(name, bytes)...], options, return_zip); files is
        empty when no file part was present or the form was malformed.
        Multiple `file`/`files` parts are accepted (reference:
        docker/app.py multi-file /file_parse)."""
        try:
            reader = await request.multipart()
        except (ValueError, AssertionError):
            return [], {}, False
        files: list[tuple[str, bytes]] = []
        options: dict = {}
        return_zip = False
        async for part in reader:
            if part.name in ("file", "files"):
                files.append(
                    (part.filename or f"document{len(files)}",
                     await part.read(decode=False))
                )
            elif part.name == "return_format":
                return_zip = (await part.text()) == "zip"
            elif part.name == "response_format_zip":
                # reference flag name (docker/app.py:169)
                return_zip = (await part.text()).lower() in ("1", "true")
            else:
                text = await part.text()
                try:
                    options[part.name] = json.loads(text)
                except json.JSONDecodeError:
                    options[part.name] = text
        return files, options, return_zip

    @routes.post("/file_parse")
    async def file_parse(request):
        files, options, return_zip = await _read_multipart(request)
        if not files:
            return web.json_response({"error": "no file uploaded"}, status=400)
        loop = asyncio.get_running_loop()
        try:
            if len(files) > 1:
                results = await loop.run_in_executor(
                    _executor, _parse_batch_bytes, files, options
                )
            else:
                results = [await loop.run_in_executor(
                    _executor, _parse_bytes, files[0][1], files[0][0], options
                )]
        except Exception as e:
            logger.exception("parse failed")
            return web.json_response({"error": str(e)}, status=500)
        if len(results) > 1 or return_zip:
            return _zip_response(results)
        result = results[0]
        import base64

        result["images"] = {
            k: base64.b64encode(v).decode() for k, v in result["images"].items()
        }
        return web.json_response(result, dumps=lambda o: json.dumps(o, default=str))

    app = web.Application(client_max_size=256 * 1024 * 1024)
    app.add_routes(routes)

    @web.middleware
    async def gzip_middleware(request, handler):
        # reference serves gzip-compressed responses (docker/app.py
        # GZipMiddleware); aiohttp enables per-response compression
        resp = await handler(request)
        if (
            "gzip" in request.headers.get("Accept-Encoding", "")
            and resp.content_type in ("application/json", "text/html")
        ):
            resp.enable_compression()
        return resp

    app.middlewares.append(gzip_middleware)
    return app


def main(host: str = "0.0.0.0", port: int = 8000):
    import os

    from aiohttp import web

    if os.environ.get("RAPIDDOC_SERVE_WARMUP"):
        # pay model build + XLA compiles at startup, not on first request
        from ..api import RapidDoc

        logger.info("warmup: building + precompiling the model stack ...")
        RapidDoc().warmup(precompile=True)
    web.run_app(make_app(), host=host, port=port)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(prog="rapiddoc_tpu.serve.http")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8000)
    args = ap.parse_args()
    main(host=args.host, port=args.port)
