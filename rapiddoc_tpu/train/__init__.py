"""Synthetic-data training for the framework's demo OCR weights.

The reference is inference-only (SURVEY.md: "not a training framework");
this package goes beyond it: it trains real, working det/rec weights on
synthetically rendered documents so the device path produces meaningful
text without network egress. The resulting "demo" checkpoints back the
quality-bearing ocr-mode e2e tests and the end-to-end benchmark; published
PP-OCRv6 checkpoints (models/download.py registry) replace them when
converted.
"""
