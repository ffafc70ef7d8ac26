"""Minimal torch_geometric unpickle shim.

The PGT datasets ship as pickles of ``torch_geometric.data.Data`` objects
(reference dataset_configs.py:981-993), but torch_geometric is not installed
in this environment. This module registers lightweight stand-in classes under
the module names the pickle stream references, enough to restore attribute
access (``data.edge_index``, ``data.x``, ``data.y``, ...). Install real PyG
and this shim steps aside automatically.
"""

from __future__ import annotations

import sys
import types


class _Storage:
    """Stand-in for torch_geometric.data.storage.GlobalStorage."""

    def __init__(self, _mapping=None, **kwargs):
        self.__dict__["_mapping"] = dict(_mapping or {})
        self.__dict__.update(kwargs)

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
            self.__dict__.setdefault("_mapping", {})
        else:
            self.__dict__["_mapping"] = {}

    def __getattr__(self, name):
        mapping = self.__dict__.get("_mapping", {})
        if name in mapping:
            return mapping[name]
        raise AttributeError(name)

    def __setattr__(self, name, value):
        self.__dict__.setdefault("_mapping", {})[name] = value

    def keys(self):
        return self.__dict__.get("_mapping", {}).keys()


class Data:
    """Stand-in for torch_geometric.data.data.Data (attr access only)."""

    def __init__(self, **kwargs):
        self.__dict__["_store"] = _Storage(kwargs)

    def __setstate__(self, state):
        self.__dict__.update(state)
        if "_store" not in self.__dict__:
            self.__dict__["_store"] = _Storage(state)

    def __getattr__(self, name):
        store = self.__dict__.get("_store")
        if store is not None:
            try:
                return getattr(store, name)
            except AttributeError:
                pass
        raise AttributeError(name)

    def __setattr__(self, name, value):
        setattr(self.__dict__.setdefault("_store", _Storage()), name, value)

    @property
    def num_nodes(self):
        store = self.__dict__.get("_store")
        mapping = store.__dict__.get("_mapping", {})
        if "num_nodes" in mapping:
            return mapping["num_nodes"]
        x = mapping.get("x")
        if x is not None:
            return x.shape[0]
        ei = mapping.get("edge_index")
        if ei is not None:
            return int(ei.max()) + 1
        return None


class _AttrStub:
    """Stand-in for DataEdgeAttr / DataTensorAttr metadata records."""

    def __init__(self, *args, **kwargs):
        self.args = args
        self.kwargs = kwargs

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)


def install() -> None:
    """Register shim modules if torch_geometric is absent."""
    try:
        import torch_geometric  # noqa: F401

        return
    except ImportError:
        pass
    if "torch_geometric" in sys.modules:
        return

    pkg = types.ModuleType("torch_geometric")
    data_pkg = types.ModuleType("torch_geometric.data")
    data_mod = types.ModuleType("torch_geometric.data.data")
    storage_mod = types.ModuleType("torch_geometric.data.storage")

    data_mod.Data = Data
    data_mod.DataEdgeAttr = _AttrStub
    data_mod.DataTensorAttr = _AttrStub
    storage_mod.GlobalStorage = _Storage
    storage_mod.BaseStorage = _Storage
    storage_mod.NodeStorage = _Storage
    storage_mod.EdgeStorage = _Storage
    data_pkg.Data = Data
    data_pkg.data = data_mod
    data_pkg.storage = storage_mod
    pkg.data = data_pkg

    sys.modules["torch_geometric"] = pkg
    sys.modules["torch_geometric.data"] = data_pkg
    sys.modules["torch_geometric.data.data"] = data_mod
    sys.modules["torch_geometric.data.storage"] = storage_mod
