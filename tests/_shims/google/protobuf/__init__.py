"""Alias the gcloud-SDK-bundled pure-python protobuf runtime (present on
this image under ``cloudsdk.google.protobuf``) as ``google.protobuf``.

Purpose: pyspark's transformWithState control channel imports generated
protobuf code (pyspark/sql/streaming/proto/StateMessage_pb2.py) which
needs a google.protobuf runtime; the container bars pip installs but
ships this vendored pure-python runtime with the Cloud SDK. The shim
installs a meta-path finder mapping google.protobuf.* submodule imports
onto the cloudsdk copies, plus a permissive ``runtime_version`` stub
(the 4.23 runtime predates the gencode's version-validation module; the
wire format itself is stable across those versions).

TEST-ONLY plumbing: production clusters install real protobuf and never
load this package (it lives under tests/_shims, appended to PYTHONPATH
by tests/conftest.py only).
"""

import importlib
import importlib.abc
import importlib.util
import sys
import types

_SDK = "/usr/lib/google-cloud-sdk/lib/third_party"
if _SDK not in sys.path:
    sys.path.append(_SDK)


class _AliasLoader(importlib.abc.Loader):
    def __init__(self, real_name):
        self.real_name = real_name

    def create_module(self, spec):
        return importlib.import_module(self.real_name)

    def exec_module(self, module):
        pass


class _Finder(importlib.abc.MetaPathFinder):
    def find_spec(self, fullname, path=None, target=None):
        if fullname == "google.protobuf.runtime_version":
            return importlib.util.spec_from_loader(fullname, _RuntimeVersionLoader())
        if fullname.startswith("google.protobuf."):
            real = "cloudsdk." + fullname
            try:
                importlib.import_module(real)
            except ImportError:
                return None
            return importlib.util.spec_from_loader(fullname, _AliasLoader(real))
        return None


class _RuntimeVersionLoader(importlib.abc.Loader):
    def create_module(self, spec):
        mod = types.ModuleType(spec.name)
        mod.Domain = types.SimpleNamespace(PUBLIC=1, GOOGLE_INTERNAL=2)
        mod.ValidateProtobufRuntimeVersion = lambda *a, **k: None
        return mod

    def exec_module(self, module):
        pass


if not any(isinstance(f, _Finder) for f in sys.meta_path):
    sys.meta_path.insert(0, _Finder())

# populate this package's namespace from the real runtime __init__
_real = importlib.import_module("cloudsdk.google.protobuf")
__version__ = _real.__version__
