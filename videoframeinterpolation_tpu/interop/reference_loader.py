"""Load the upstream PyTorch reference repo as a numerical oracle (CPU).

The reference (see SURVEY.md) depends on three packages that only matter
on CUDA hosts — ``cupy`` (JIT-compiles the softsplat kernels), ``timm``
(one ``trunc_normal_`` import) and ``torchvision`` (``deform_conv2d``).
None of them is needed to *construct* or run the models we use as parity
oracles on CPU, so this loader installs minimal stubs before importing.
The stubbed native ops raise if actually called.

Usage (tests)::

    ref = load_reference(root="/root/reference")   # None if unavailable
    IFRNet = ref.archive_ifrnet().IFRNet

Nothing here copies reference code — the modules are imported from the
read-only checkout and executed as-is (PyTorch CPU).
"""

from __future__ import annotations

import importlib
import os
import sys
import types

DEFAULT_ROOT = os.environ.get("VFI_REFERENCE_ROOT", "/root/reference")


def _install_stubs() -> None:
    if "cupy" not in sys.modules:
        cupy = types.ModuleType("cupy")
        cupy.memoize = lambda **kw: (lambda f: f)  # decorator factory
        cupy.int32 = int
        cupy.float32 = float
        cuda = types.ModuleType("cupy.cuda")

        def _no_cuda(*a, **kw):
            raise RuntimeError("cupy stub: CUDA kernels unavailable on CPU")

        cuda.compile_with_cache = _no_cuda
        cupy.cuda = cuda
        sys.modules["cupy"] = cupy
        sys.modules["cupy.cuda"] = cuda

    if "timm" not in sys.modules:
        import torch.nn.init as tinit

        timm = types.ModuleType("timm")
        models = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")
        layers.trunc_normal_ = tinit.trunc_normal_
        models.layers = layers
        timm.models = models
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = models
        sys.modules["timm.models.layers"] = layers

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        ops = types.ModuleType("torchvision.ops")

        def _no_dcn(*a, **kw):
            raise RuntimeError(
                "torchvision stub: deform_conv2d unavailable in this image"
            )

        ops.deform_conv2d = _no_dcn
        tv.ops = ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = ops


class ReferenceRepo:
    """Lazy importer for reference modules (by their own package names)."""

    def __init__(self, root: str):
        self.root = root

    def module(self, name: str):
        _install_stubs()
        if self.root not in sys.path:
            # Append (not prepend): the reference's top-level package names
            # (models/modules/utils/data) are generic; nothing else provides
            # them, and appending keeps them from shadowing anything.
            sys.path.append(self.root)
        return importlib.import_module(name)

    def archive_ifrnet(self):
        return self.module("models.archive.IFRNet")

    def dat(self):
        return self.module("models.DAT")

    def deformable_attn(self):
        return self.module("modules.deformable_attn")

    def cnn_encoders(self):
        return self.module("modules.cnn_encoders")

    def generator(self):
        return self.module("modules.generator")

    def query_builder(self):
        return self.module("modules.query_builder")


def load_reference(root: str = DEFAULT_ROOT) -> ReferenceRepo | None:
    """Return a :class:`ReferenceRepo`, or None if torch/repo are absent."""
    if not os.path.isdir(root):
        return None
    try:
        import torch  # noqa: F401
    except Exception:
        return None
    return ReferenceRepo(root)
