"""rapiddoc_tpu: TPU-native document parsing framework.

PDF/image/Office -> Markdown/JSON, with the model stack (layout, OCR,
formula, table) running as bucketed JAX/XLA programs on TPU.
"""
import os as _os

from .version import __version__


def _force_platform() -> None:
    """Honor RAPIDDOC_PLATFORM / MINERU_PLATFORM (e.g. ``cpu``).

    Out-of-tree TPU plugins may register themselves regardless of the
    ``JAX_PLATFORMS`` env var; the only override they respect is
    ``jax.config.update("jax_platforms", ...)`` before backend init.
    This gives library users a working escape hatch when the TPU link
    is down (otherwise the first device touch blocks indefinitely).
    """
    plat = _os.environ.get("RAPIDDOC_PLATFORM") or _os.environ.get(
        "MINERU_PLATFORM"
    )
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


_force_platform()

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
