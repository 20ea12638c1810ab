"""Load the reference's torch network zoo as a standalone package.

The reference networks are the architecture oracle for numerical parity
tests (SURVEY.md §2.9). We alias the modeling package under a private name
so that importing it does not execute rapid_doc/__init__.py (which needs
dependencies absent from this environment). Nothing is copied.
"""
import importlib
import importlib.util
import sys
from pathlib import Path

_REF = Path("/root/reference/rapid_doc/model/ocr/ppocrv6_pytorch/modeling")
_FORMULA_REF = Path(
    "/root/reference/rapid_doc/model/formula/rapid_formula_self/networks"
)

_ALIAS = "_ref_ocr_modeling"
_FORMULA_ALIAS = "_ref_formula_networks"


def _register(alias: str, path: Path) -> None:
    if alias in sys.modules:
        return
    spec = importlib.util.spec_from_file_location(
        alias, path / "__init__.py", submodule_search_locations=[str(path)]
    )
    module = importlib.util.module_from_spec(spec)
    sys.modules[alias] = module
    try:
        spec.loader.exec_module(module)
    except Exception:
        # __init__ may import optional deps; submodules can still be loaded
        pass


def available() -> bool:
    return _REF.is_dir()


def load(submodule: str):
    """e.g. load('backbones.rec_lcnetv4')."""
    _register(_ALIAS, _REF)
    return importlib.import_module(f"{_ALIAS}.{submodule}")


def load_formula(submodule: str):
    _register(_FORMULA_ALIAS, _FORMULA_REF)
    return importlib.import_module(f"{_FORMULA_ALIAS}.{submodule}")


def load_file(alias: str, path: str):
    """Load a single standalone reference module by file path (e.g. the
    unitable torch modules, which have no package-relative imports)."""
    if alias in sys.modules:
        return sys.modules[alias]
    spec = importlib.util.spec_from_file_location(alias, path)
    module = importlib.util.module_from_spec(spec)
    sys.modules[alias] = module
    spec.loader.exec_module(module)
    return module
