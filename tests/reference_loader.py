"""Load the PUBLIC reference PyTorch modules (read-only, /root/reference)
for golden-parity testing.

The reference files carry dead imports that break on a modern interpreter
(``from nis import match``, mmcv/mmaction, hard-coded ``.cuda()``); this
loader stubs those so the modules execute on CPU torch.  Only used by tests —
the framework itself never imports reference code.
"""

import importlib.util
import sys
import types

REF = "/root/reference"

_loaded = {}


def _stub(name):
    if name not in sys.modules:
        sys.modules[name] = types.ModuleType(name)
    return sys.modules[name]


def load_reference_models():
    """Returns (audio_net, fusion_net, criterion, vision_net, synthesizer_net)
    modules from the reference, importable on CPU."""
    if _loaded:
        return _loaded["modules"]

    class _Permissive(types.ModuleType):
        def __getattr__(self, name):
            return None

    for mod in ("nis", "turtle"):
        if mod not in sys.modules:
            sys.modules[mod] = _Permissive(mod)
    import torch
    # reference fusion_net hard-codes .cuda() (fusion_net.py:96,212,297)
    torch.Tensor.cuda = lambda self, *a, **k: self

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    pkg = types.ModuleType("refmodels")
    pkg.__path__ = [REF + "/models"]
    sys.modules["refmodels"] = pkg
    fusion_net = load("refmodels.fusion_net", REF + "/models/fusion_net.py")
    pkg.fusion_net = fusion_net
    audio_net = load("refmodels.audio_net", REF + "/models/audio_net.py")
    criterion = load("refmodels.criterion", REF + "/models/criterion.py")
    vision_net = load("refmodels.vision_net", REF + "/models/vision_net.py")
    synthesizer_net = load("refmodels.synthesizer_net",
                           REF + "/models/synthesizer_net.py")
    mods = (audio_net, fusion_net, criterion, vision_net, synthesizer_net)
    _loaded["modules"] = mods
    return mods


def load_reference_sop():
    """Returns (audio_net, attention_net) modules from the reference SoP++."""
    if "sop" in _loaded:
        return _loaded["sop"]
    load_reference_models()  # stubs + refmodels.fusion_net for relative import

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    import types as _t
    pkg = _t.ModuleType("refsop")
    pkg.__path__ = ["/root/reference/SoP++"]
    sys.modules["refsop"] = pkg
    pkg.fusion_net = sys.modules["refmodels.fusion_net"]
    sys.modules["refsop.fusion_net"] = pkg.fusion_net
    sop_audio = load("refsop.audio_net", REF + "/SoP++/audio_net.py")
    sop_att = load("refsop.attention_net", REF + "/SoP++/attention_net.py")
    _loaded["sop"] = (sop_audio, sop_att)
    return _loaded["sop"]
