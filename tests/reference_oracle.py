"""Loader for the reference implementation's torch-only modules.

The differential parity suite (test_reference_parity.py) imports the
reference's OWN torch code from /root/reference and runs it as the oracle
against this framework's JAX implementations on shared random inputs.

Most reference modules import `pytorch_lightning` / `torchvision` / `nerfacc`
at module level but only *use* them inside training-loop methods we never
call. Those packages are not installed here, so we install minimal stub
modules into sys.modules before importing — the numeric code under test
(encodings, activations, Lie maps, Kabsch, the renderer equation, the
segmented MLP, hash tables, schedules) is pure torch and runs unmodified.

Nothing from /root/reference is copied; it is imported read-only at test
time as a differential-testing oracle.
"""
from __future__ import annotations

import importlib
import importlib.util
import os
import sys
import types

REFERENCE_ROOT = "/root/reference"
_BARF_DIR = os.path.join(REFERENCE_ROOT, "barf")


def _install_stubs() -> None:
    import torch.nn as nn

    if "pytorch_lightning" not in sys.modules:
        pl = types.ModuleType("pytorch_lightning")
        pl.LightningModule = nn.Module
        pl.LightningDataModule = object

        cb = types.ModuleType("pytorch_lightning.callbacks")

        class _StubCallback:  # accepts any construction, never used
            def __init__(self, *args, **kwargs):
                pass

        cb.Callback = _StubCallback
        cb.LambdaCallback = _StubCallback
        pl.callbacks = cb
        sys.modules["pytorch_lightning"] = pl
        sys.modules["pytorch_lightning.callbacks"] = cb

    for name in ("torchvision", "nerfacc", "wandb"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)


def load_barf(module_name: str):
    """Import a module from reference/barf/ (flat sibling imports resolved
    by putting the directory on sys.path). Cached via sys.modules."""
    _install_stubs()
    if _BARF_DIR not in sys.path:
        sys.path.insert(0, _BARF_DIR)
    return importlib.import_module(module_name)


def load_file(relpath: str, alias: str, extra_stubs: dict | None = None):
    """Spec-load a single reference file under a unique module alias.

    extra_stubs: {module_name: {attr: value}} stub modules the file's flat
    imports need (e.g. 2d-ingp/model.py does `from data_loader import ...`).
    """
    _install_stubs()
    for name, attrs in (extra_stubs or {}).items():
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for attr, value in attrs.items():
                setattr(mod, attr, value)
            sys.modules[name] = mod
    if alias in sys.modules:
        return sys.modules[alias]
    path = os.path.join(REFERENCE_ROOT, relpath)
    spec = importlib.util.spec_from_file_location(alias, path)
    module = importlib.util.module_from_spec(spec)
    sys.modules[alias] = module
    spec.loader.exec_module(module)
    return module


def load_optimize():
    """test-camera-similarity/optimize.py runs a matplotlib demo at import;
    force the Agg backend so it is head-less and non-blocking."""
    import matplotlib

    matplotlib.use("Agg", force=True)
    return load_file("test-camera-similarity/optimize.py", "ref_optimize")
