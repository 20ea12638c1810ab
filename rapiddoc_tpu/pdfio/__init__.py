"""Self-contained PDF subsystem (parse, extract text, rasterize, write).

The environment has no PDF library; this package fills the role pypdfium2 +
pdftext play in the reference implementation.
"""
from .classify import classify_pdf
from .document import PdfDocument, PdfError, PdfPage, open_pdf
from .render import render_page, render_pdf_page
from .text import get_page, page_text
from .writer import images_to_pdf, loadable_page_indices, select_pages

__all__ = [
    "PdfDocument",
    "PdfPage",
    "PdfError",
    "open_pdf",
    "render_page",
    "render_pdf_page",
    "get_page",
    "page_text",
    "images_to_pdf",
    "select_pages",
    "loadable_page_indices",
    "classify_pdf",
]
