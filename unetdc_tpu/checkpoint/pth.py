"""Torch-free reader for PyTorch ``.pth`` checkpoints.

The published reference checkpoint (`best_UNetDC_focal_model.pth`,
reference README.md:52-54) is a ``torch.save(state_dict)`` zip archive:
``archive/data.pkl`` pickled with persistent IDs pointing at raw tensor
storages in ``archive/data/<key>``. This module parses that format with only
the stdlib + numpy, so the framework has no PyTorch runtime dependency.
(If torch is importable we still prefer our reader; tests cross-check both.)

Reference consumers of this format: quantify_droplets_batch.py:36,
algorithms.py:66, train_DC_focal.py:365.
"""

from __future__ import annotations

import io
import pickle
import zipfile
from typing import Dict

import numpy as np

# torch storage type name -> numpy dtype
_STORAGE_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
    "BFloat16Storage": None,  # handled specially below
}


class _TorchTensorStub:
    """Lazy tensor: raw storage bytes + (offset, size, stride) view."""

    def __init__(self, data: bytes, dtype, offset, size, stride):
        self.data = data
        self.dtype = dtype
        self.offset = offset
        self.size = tuple(size)
        self.stride = tuple(stride)

    def to_numpy(self) -> np.ndarray:
        if self.dtype is None:  # bfloat16: widen via uint16 -> float32
            raw = np.frombuffer(self.data, dtype=np.uint16)
            flat = (raw.astype(np.uint32) << 16).view(np.float32)
            itemsize = 4
        else:
            flat = np.frombuffer(self.data, dtype=self.dtype)
            itemsize = flat.dtype.itemsize
        base = flat[self.offset:]
        strides_bytes = tuple(s * itemsize for s in self.stride)
        arr = np.lib.stride_tricks.as_strided(base, self.size, strides_bytes)
        return np.ascontiguousarray(arr)


class _Unpickler(pickle.Unpickler):
    def __init__(self, file, storages):
        super().__init__(file)
        self._storages = storages

    def persistent_load(self, pid):
        # pid = ('storage', StorageType, key, location, numel)
        assert pid[0] == "storage", f"unexpected persistent id {pid!r}"
        storage_type, key = pid[1], pid[2]
        if isinstance(storage_type, _StorageTypeStub):
            name = storage_type.name
        else:  # torch class object when torch happens to be importable
            name = getattr(storage_type, "__name__", str(storage_type))
        return ("storage", name, key)

    def find_class(self, module, name):
        if name == "_rebuild_tensor_v2" and module.startswith("torch"):
            return _rebuild_tensor_v2_factory(self._storages)
        if name == "_rebuild_parameter" and module.startswith("torch"):
            return lambda data, requires_grad, hooks: data
        if module.startswith("torch") and name.endswith("Storage"):
            return _StorageTypeStub(name)
        if module == "collections" and name == "OrderedDict":
            import collections

            return collections.OrderedDict
        if module.startswith("torch"):
            # any other torch symbol: return inert stub
            return _StorageTypeStub(name)
        return super().find_class(module, name)


class _StorageTypeStub:
    def __init__(self, name):
        self.name = name

    def __call__(self, *a, **k):  # pragma: no cover - defensive
        return self


def _rebuild_tensor_v2_factory(storages):
    def _rebuild(storage_ref, storage_offset, size, stride, requires_grad,
                 backward_hooks, metadata=None):
        _, type_name, key = storage_ref
        dtype = _STORAGE_DTYPES.get(type_name, np.float32)
        data = storages[key]
        return _TorchTensorStub(data, dtype, storage_offset, size, stride)

    return _rebuild


def load_pth_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch.save()'d state dict as {name: numpy array}."""
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        prefix = names[0].split("/", 1)[0]
        storages = {}
        for n in names:
            parts = n.split("/")
            if len(parts) >= 2 and parts[-2] == "data":
                storages[parts[-1]] = zf.read(n)
        pkl = zf.read(f"{prefix}/data.pkl")
    obj = _Unpickler(io.BytesIO(pkl), storages).load()
    out = {}
    for k, v in obj.items():
        if isinstance(v, _TorchTensorStub):
            out[k] = v.to_numpy()
        else:  # e.g. num_batches_tracked scalars already plain
            out[k] = np.asarray(v)
    return out
