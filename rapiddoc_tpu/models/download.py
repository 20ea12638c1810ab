"""Model asset registry + SHA256-verified downloader.

Role parity with the reference (reference: rapid_doc/utils/
download_file.py:14-177 + models_download_utils.py + per-stack
default_models.yaml URL/SHA registries). Assets here are the published
torch checkpoints; `rapiddoc_tpu.tools.convert_weights` turns them into
the framework's npz trees. In zero-egress environments the downloader
reports clearly instead of hanging.
"""
from __future__ import annotations

import hashlib
from dataclasses import dataclass
from pathlib import Path

from ..config import get_models_dir
from ..utils.logging import get_logger

logger = get_logger("rapiddoc_tpu.download")


@dataclass(frozen=True)
class ModelAsset:
    name: str            # local file name under the models dir
    url: str             # source checkpoint (torch/safetensors)
    sha256: str | None   # pin; None = unpinned (filled on first fetch)
    converter: str       # rapiddoc_tpu.tools.convert_weights entry name


# The published checkpoints the reference pipeline downloads
# (reference: rapid_doc/model/*/default_models.yaml); URLs point at the
# modelscope mirrors the reference uses.
REGISTRY: dict[str, ModelAsset] = {
    "ocr_det_v6_small": ModelAsset(
        "ch_PP-OCRv6_det_small.safetensors",
        "https://modelscope.cn/models/RapidAI/RapidOCR/resolve/master/"
        "torch/PP-OCRv6/det/ch_PP-OCRv6_det_small.safetensors",
        None,
        "det",
    ),
    "ocr_rec_v6_small": ModelAsset(
        "ch_PP-OCRv6_rec_small.safetensors",
        "https://modelscope.cn/models/RapidAI/RapidOCR/resolve/master/"
        "torch/PP-OCRv6/rec/ch_PP-OCRv6_rec_small.safetensors",
        None,
        "rec",
    ),
    "formula_net_plus_m": ModelAsset(
        "pp_formulanet_plus_m.pth",
        "https://modelscope.cn/models/RapidAI/RapidFormula/resolve/master/"
        "pp_formulanet_plus_m.pth",
        None,
        "formula",
    ),
    "table_unitable": ModelAsset(
        "unitable.pth",
        "https://modelscope.cn/models/RapidAI/RapidTable/resolve/master/"
        "unitable.pth",
        None,
        "unitable",
    ),
}


def sha256_of(path: Path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def download_asset(key: str, force: bool = False) -> Path:
    asset = REGISTRY[key]
    target = get_models_dir() / asset.name
    if target.is_file() and not force:
        if asset.sha256 and sha256_of(target) != asset.sha256:
            raise RuntimeError(f"{target} fails SHA256 pin; re-download with force")
        return target
    import requests

    target.parent.mkdir(parents=True, exist_ok=True)
    tmp = target.with_suffix(target.suffix + ".part")
    logger.info("downloading %s -> %s", asset.url, target)
    try:
        with requests.get(asset.url, stream=True, timeout=60) as resp:
            resp.raise_for_status()
            with open(tmp, "wb") as f:
                for chunk in resp.iter_content(1 << 20):
                    f.write(chunk)
    except requests.RequestException as e:
        tmp.unlink(missing_ok=True)
        raise RuntimeError(
            f"cannot download {key}: {e}. This environment may have no "
            f"network egress — place {asset.name} under {get_models_dir()} "
            f"manually, then run rapiddoc_tpu.tools.convert_weights."
        ) from e
    if asset.sha256 and sha256_of(tmp) != asset.sha256:
        tmp.unlink(missing_ok=True)
        raise RuntimeError(f"SHA256 mismatch for {key}")
    tmp.rename(target)
    return target
