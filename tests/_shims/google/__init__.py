# namespace package for the google.protobuf alias shim (see protobuf/__init__.py)
