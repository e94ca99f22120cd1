"""Loader for the reference PyTorch models at /root/reference.

The reference's `models/__init__.py:1` imports `models.gwcnet_au_h3`, a
module absent from the snapshot (SURVEY.md §1 "known snapshot
inconsistencies"), so a bare import fails. This helper pre-registers a stub
for that module, puts the reference root on sys.path, and returns the
requested reference module — used by tests/test_torch_parity.py to build the
actual torch networks for end-to-end numerical parity scoring.

Nothing here executes reference code beyond importing the model definitions;
no files under /root/reference are modified.
"""

from __future__ import annotations

import importlib
import sys
import types

REFERENCE_ROOT = "/root/reference"


def load_reference_module(name: str):
    """Import a module (e.g. "models.gwcnet_dca_g") from the reference tree."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    if "models.gwcnet_au_h3" not in sys.modules:
        stub = types.ModuleType("models.gwcnet_au_h3")
        stub.GwcNet_G = None
        stub.GwcNet_GC = None
        sys.modules["models.gwcnet_au_h3"] = stub
    return importlib.import_module(name)


def randomize_bn_stats(model, seed: int = 0):
    """Randomize BN affine params and running stats in-place so that eval-mode
    parity checks exercise non-trivial normalization (fresh torch BN is
    weight=1/bias=0/mean=0/var=1, which would mask layout or momentum bugs)."""
    import torch

    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
            with torch.no_grad():
                m.weight.uniform_(0.5, 1.5, generator=g)
                m.bias.normal_(0.0, 0.1, generator=g)
                m.running_mean.normal_(0.0, 0.2, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)
    return model
