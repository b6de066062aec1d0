"""Load reference (PyTorch) modules from /root/reference for parity testing
WITHOUT executing the package __init__ (which drags in transformers/cv2 and
model constructors that crash at this snapshot — SURVEY.md §2.9#1).

This imports the upstream code read-only at test time to generate golden
outputs; no reference code is copied into this repo.
"""

import os
import sys
import types

import pytest

_REF = "/root/reference"


def load_ref_module(name: str):
    """e.g. load_ref_module("models.softmax_attention"). Skips the calling
    test when the read-only reference checkout is not present."""
    if not os.path.isdir(_REF):
        pytest.skip("reference checkout not available")
    if "models" not in sys.modules or not getattr(
        sys.modules["models"], "__ref_stub__", False
    ):
        pkg = types.ModuleType("models")
        pkg.__path__ = [f"{_REF}/models"]
        pkg.__ref_stub__ = True
        sys.modules["models"] = pkg
        # populate the re-exports some reference modules pull from the package
        # root (e.g. vit_moe.py: `from models import SwitchHeadAttention`)
        __import__("models.switchhead_attention")
        __import__("models.moe")
        pkg.SwitchHeadAttention = sys.modules[
            "models.switchhead_attention"
        ].SwitchHeadAttention
        pkg.MoELayer = sys.modules["models.moe"].MoELayer
    __import__(name)
    return sys.modules[name]
