"""Command-line interface.

Role parity with the reference CLI (reference:
rapid_doc/cli/gradio_app.py:483-537 click main + cli/common.py
do_parse outputs: md / middle / content_list / model json / debug pdfs).
"""
from __future__ import annotations

import json
from pathlib import Path

import click

from ..types import MakeMode


@click.command()
@click.argument("inputs", nargs=-1, required=True,
                type=click.Path(exists=True))
@click.option("-o", "--output-dir", default="./output", show_default=True,
              help="Output directory")
@click.option("-m", "--method", default="auto",
              type=click.Choice(["auto", "txt", "ocr"]), show_default=True)
@click.option("-l", "--lang", default="ch", show_default=True)
@click.option("--formula/--no-formula", default=True, show_default=True)
@click.option("--table/--no-table", default=True, show_default=True)
@click.option("--md-mode", default=MakeMode.MM_MD,
              type=click.Choice([MakeMode.MM_MD, MakeMode.NLP_MD]),
              show_default=True)
@click.option("--start-page", default=0, show_default=True)
@click.option("--end-page", default=None, type=int)
@click.option("--draw-layout", is_flag=True, help="Emit *_layout.pdf debug overlay")
@click.option("--html", "emit_html", is_flag=True, help="Also emit .html")
@click.option("--docx", "emit_docx", is_flag=True, help="Also emit .docx")
@click.option("--checkbox", "checkbox_enable", is_flag=True,
              help="Detect checkboxes (☐/☑ glyphs in output)")
@click.option("--checkpoint-dir", default=None,
              help="Per-window resume checkpoints directory")
def main(inputs, output_dir, method, lang, formula, table, md_mode,
         start_page, end_page, draw_layout, emit_html, emit_docx,
         checkbox_enable, checkpoint_dir):
    """Parse PDF/image/Office documents into Markdown + JSON."""
    from ..api import RapidDoc

    engine = RapidDoc(
        parse_method=method,
        lang=lang,
        formula_enable=formula,
        table_enable=table,
        make_md_mode=md_mode,
        checkbox_config={"checkbox_enable": True} if checkbox_enable else None,
        checkpoint_dir=checkpoint_dir,
    )
    out_root = Path(output_dir)
    for path in inputs:
        path = Path(path)
        click.echo(f"parsing {path} ...")
        data: bytes = path.read_bytes()
        if (start_page or end_page is not None) and path.suffix.lower() == ".pdf":
            from .. import pdfio

            n = len(pdfio.open_pdf(data))
            end = end_page if end_page is not None else n - 1
            data = pdfio.select_pages(data, range(start_page, min(end + 1, n)))
        out = engine(data if path.suffix.lower() != "" else str(path))
        name = path.stem
        doc_dir = out_root / name
        doc_dir.mkdir(parents=True, exist_ok=True)
        (doc_dir / f"{name}.md").write_text(out.markdown, encoding="utf-8")
        (doc_dir / f"{name}_middle.json").write_text(
            json.dumps(out.middle_json, ensure_ascii=False, default=str),
            encoding="utf-8",
        )
        (doc_dir / f"{name}_content_list.json").write_text(
            json.dumps(out.content_list_json, ensure_ascii=False, default=str),
            encoding="utf-8",
        )
        img_dir = doc_dir
        for rel, blob in out.images.items():
            target = doc_dir / rel
            target.parent.mkdir(parents=True, exist_ok=True)
            target.write_bytes(blob)
        if draw_layout and data[:5].lstrip()[:4] == b"%PDF":
            from ..utils.draw import debug_pdfs_from_output

            overlays = debug_pdfs_from_output(data, out.middle_json)
            if "layout" in overlays:
                (doc_dir / f"{name}_layout.pdf").write_bytes(
                    overlays["layout"]
                )
        if emit_html:
            from ..utils.markdown_convert import markdown_to_html

            (doc_dir / f"{name}.html").write_text(
                markdown_to_html(out.markdown), encoding="utf-8"
            )
        if emit_docx:
            from ..utils.markdown_convert import markdown_to_docx

            (doc_dir / f"{name}.docx").write_bytes(
                markdown_to_docx(out.markdown)
            )
        click.echo(f"  -> {doc_dir}")


if __name__ == "__main__":
    main()
