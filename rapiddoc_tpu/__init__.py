"""rapiddoc_tpu: TPU-native document parsing framework.

PDF/image/Office -> Markdown/JSON, with the model stack (layout, OCR,
formula, table) running as bucketed JAX/XLA programs on TPU.
"""
from .version import __version__

__all__ = [
    "RapidDoc",
    "RapidDocOutput",
    "result_to_middle_json",
    "union_make",
    "do_parse",
    "aio_do_parse",
    "CustomBaseModel",
    "__version__",
]

_LAZY = {
    "RapidDoc": ("api", "RapidDoc"),
    "RapidDocOutput": ("api", "RapidDocOutput"),
    "result_to_middle_json": ("pipeline.middle", "result_to_middle_json"),
    "union_make": ("pipeline.mkcontent", "union_make"),
    "do_parse": ("cli.common", "do_parse"),
    "aio_do_parse": ("cli.common", "aio_do_parse"),
    "CustomBaseModel": ("models.custom", "CustomBaseModel"),
}


def __getattr__(name):
    # lazy imports keep `import rapiddoc_tpu` light (no jax import)
    target = _LAZY.get(name)
    if target is None:
        raise AttributeError(name)
    import importlib

    mod = importlib.import_module(f".{target[0]}", __name__)
    return getattr(mod, target[1])
