"""Safe checkpoint unpickling: tensors are harvested, arbitrary code is NOT
executed (the reference torch.loads untrusted YOLO checkpoints wholesale,
LightDiffusion.py:8455-8461 — we allowlist tensor-rebuild globals only)."""

import os
import pickle

import numpy as np
import pytest
import torch

from lightdiffusion_tpu.loader.torch_pickle import (
    _allowed_global,
    load_any_torch_checkpoint,
)


class _NotImportableHere:
    """Pickled by reference; module path rewritten to a phantom package."""


def test_plain_state_dict_roundtrip(tmp_path):
    sd = {"a.weight": torch.arange(6, dtype=torch.float32).reshape(2, 3)}
    p = tmp_path / "plain.pt"
    torch.save(sd, p)
    out = load_any_torch_checkpoint(p)
    np.testing.assert_allclose(out["a.weight"], np.arange(6).reshape(2, 3))


def test_stubbed_unknown_classes_harvest_tensors(tmp_path):
    obj = _NotImportableHere()
    obj.__dict__["weights"] = {"conv.weight": torch.ones(2, 2)}
    p = tmp_path / "obj.pt"
    torch.save({"model": obj}, p)
    # rewrite the module path (same byte length — the pickle lives in a zip)
    # so weights_only AND direct import both fail
    assert len(b"tests.test_torch_pickle") == len(b"phantom_pkg.module_xyzw")
    data = p.read_bytes().replace(b"tests.test_torch_pickle",
                                  b"phantom_pkg.module_xyzw")
    p.write_bytes(data)
    out = load_any_torch_checkpoint(p)
    assert any("conv.weight" in k for k in out), out.keys()


def test_malicious_reduce_does_not_execute(tmp_path):
    sentinel = tmp_path / "pwned"

    class Evil:
        def __reduce__(self):
            return (os.system, (f"touch {sentinel}",))

    p = tmp_path / "evil.pt"
    torch.save({"payload": Evil(), "w": torch.zeros(1)}, p)
    out = load_any_torch_checkpoint(p)
    assert not sentinel.exists(), "pickle REDUCE executed os.system!"
    assert "w" in out


def test_allowlist_policy():
    assert _allowed_global("torch._utils", "_rebuild_tensor_v2")
    assert _allowed_global("collections", "OrderedDict")
    assert _allowed_global("torch", "FloatStorage")
    assert not _allowed_global("os", "system")
    assert not _allowed_global("builtins", "eval")
    assert not _allowed_global("subprocess", "Popen")
    assert not _allowed_global("torch._utils", "anything_else")
