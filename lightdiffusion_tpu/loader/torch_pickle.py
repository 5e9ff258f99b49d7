"""Extract flat state dicts from torch checkpoints whose pickles reference
packages we don't ship (ultralytics model objects etc.).

The reference loads YOLO weights through the ultralytics package
(/root/reference/LightDiffusion.py:8464, torch.load hotfix :8455-8461). Here
a stub Unpickler reconstructs the object graph with inert placeholder
classes, then the tensor tree is harvested by walking ``__dict__``/_modules.
SAM/plain checkpoints short-circuit through ``weights_only=True``.
"""

from __future__ import annotations

import logging
import pickle
from pathlib import Path

import numpy as np

log = logging.getLogger(__name__)


class _Stub:
    """Inert stand-in for any unpicklable class."""

    def __init__(self, *a, **k):
        pass

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        elif isinstance(state, tuple):
            for part in state:
                if isinstance(part, dict):
                    self.__dict__.update(part)

    def __call__(self, *a, **k):  # some reduces call the object
        return self


def _allowed_global(module: str, name: str) -> bool:
    """Globals a checkpoint legitimately needs to rebuild tensors — nothing
    that can execute attacker-controlled code."""
    if module == "collections" and name == "OrderedDict":
        return True
    if module == "torch._utils" and name.startswith("_rebuild"):
        return True
    if module == "torch" and (
        name.endswith("Storage") or name in ("Size", "device", "dtype")
    ):
        return True
    if module == "torch.storage" and name == "_load_from_bytes":
        return True  # legacy-format tensor payloads
    if module.startswith("numpy") and name in (
        "_reconstruct", "ndarray", "dtype", "scalar", "_frombuffer",
    ):
        return True
    return False


def load_any_torch_checkpoint(path: str | Path) -> dict:
    """Best effort: returns a flat {name: np.ndarray} state dict."""
    import torch

    try:
        obj = torch.load(str(path), map_location="cpu", weights_only=True)
        return _harvest(obj)
    except Exception:
        pass


    class StubUnpickler(pickle.Unpickler):
        """ALLOWLIST unpickler: only tensor-rebuild globals resolve to real
        callables; every other global — importable or not — becomes an inert
        _Stub subclass, so a malicious checkpoint cannot reach os.system &co
        through a pickle REDUCE. (The reference torch.loads untrusted YOLO
        checkpoints wholesale, :8455-8461 — do not replicate.)"""

        def find_class(self, module, name):
            if _allowed_global(module, name):
                return super().find_class(module, name)
            return type(f"{module}.{name}", (_Stub,), {})

    # torch.load allows a custom pickle_module; wrap one around StubUnpickler
    class _PickleModule:
        Unpickler = StubUnpickler
        load = staticmethod(pickle.load)

    obj = torch.load(
        str(path), map_location="cpu", pickle_module=_PickleModule,
        weights_only=False,
    )
    return _harvest(obj)


def _harvest(obj, prefix: str = "", out: dict | None = None, depth: int = 0) -> dict:
    """Walk a checkpoint object graph collecting tensors."""
    import torch

    if out is None:
        out = {}
    if depth > 24:
        return out
    if isinstance(obj, torch.Tensor):
        out[prefix.rstrip(".")] = obj.float().numpy()
        return out
    if isinstance(obj, dict):
        for k, v in obj.items():
            if isinstance(k, str) and k in ("train_args", "optimizer"):
                continue
            _harvest(v, f"{prefix}{k}.", out, depth + 1)
        return out
    if isinstance(obj, (list, tuple)):
        for i, v in enumerate(obj):
            _harvest(v, f"{prefix}{i}.", out, depth + 1)
        return out
    d = getattr(obj, "__dict__", None)
    if d:
        params = d.get("_parameters") or {}
        buffers = d.get("_buffers") or {}
        modules = d.get("_modules") or {}
        for k, v in {**params, **buffers}.items():
            if v is not None:
                _harvest(v, f"{prefix}{k}.", out, depth + 1)
        for k, v in modules.items():
            _harvest(v, f"{prefix}{k}.", out, depth + 1)
        if not (params or buffers or modules):
            for k, v in d.items():
                if k.startswith("_"):
                    continue
                _harvest(v, f"{prefix}{k}.", out, depth + 1)
    return out
