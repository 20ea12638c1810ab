"""rapiddoc_tpu: TPU-native document parsing framework.

PDF/image/Office -> Markdown/JSON, with the model stack (layout, OCR,
formula, table) running as bucketed JAX/XLA programs on TPU.
"""
from .version import __version__

__all__ = ["RapidDoc", "RapidDocOutput", "__version__"]


def __getattr__(name):
    # lazy imports keep `import rapiddoc_tpu` light (no jax import)
    if name in ("RapidDoc", "RapidDocOutput"):
        from . import api

        return getattr(api, name)
    raise AttributeError(name)
