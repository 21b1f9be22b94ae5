"""Load individual reference modules from /root/reference for golden-value
parity tests WITHOUT importing the full medmm package (which needs yacs,
sksurv, timm, CUDA...).  The reference is treated as a black-box oracle:
we execute its code, never copy it.
"""

import importlib.util
import sys
import types

import torch

REF = "/root/reference"


def _patch_cuda():
    """Reference code hardcodes .cuda() (e.g. ops/utils.py:198); run on CPU."""
    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore


def load_ref_module(relpath: str, name: str, stubs: dict = None):
    """Load a single reference .py file under a synthetic module name,
    pre-registering stub modules for its package-relative imports."""
    _patch_cuda()
    stubs = stubs or {}
    for mod_name, mod in stubs.items():
        sys.modules[mod_name] = mod
    spec = importlib.util.spec_from_file_location(name, f"{REF}/{relpath}")
    module = importlib.util.module_from_spec(spec)
    sys.modules[name] = module
    spec.loader.exec_module(module)
    return module


def fake_registry_module(mod_name: str, registry_attr: str):
    """A stub for the reference's ``.build`` modules: provides a no-op
    registry object with a ``register`` decorator."""
    mod = types.ModuleType(mod_name)

    class _FakeRegistry:
        def register(self, obj=None, **kw):
            if obj is None:
                return lambda f: f
            return obj

    setattr(mod, registry_attr, _FakeRegistry())
    return mod


def load_ref_losses():
    import types as _t

    pkg = types.ModuleType("ref_loss_pkg")
    pkg.__path__ = [f"{REF}/medmm/loss"]
    sys.modules["ref_loss_pkg"] = pkg
    build_stub = fake_registry_module("ref_loss_pkg.build", "LOSS_REGISTRY")
    spec = importlib.util.spec_from_file_location(
        "ref_loss_pkg.loss", f"{REF}/medmm/loss/loss.py"
    )
    module = importlib.util.module_from_spec(spec)
    sys.modules["ref_loss_pkg.loss"] = module
    sys.modules["ref_loss_pkg.build"] = build_stub
    spec.loader.exec_module(module)
    return module


def load_ref_ops_utils():
    """Reference medmm/modeling/ops/utils.py (modularity, pinv, sinkhorn)."""
    return load_ref_module("medmm/modeling/ops/utils.py", "ref_ops_utils")
