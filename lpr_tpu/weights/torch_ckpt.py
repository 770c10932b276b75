"""Safe, torch-free reader for PyTorch zip checkpoints.

The reference ships full *pickled nn.Module* checkpoints
(``weights/char.pt``; see reference ``yolov5/models/experimental.py:75-119``
which ``torch.load``s them, executing arbitrary pickle bytecode) and plain
state-dict checkpoints (``weights/best_model.pth``).  Loading untrusted
pickles with ``torch.load`` executes code; this module instead parses the
pickle stream with a restricted Unpickler that

- never imports or executes model classes: every unknown global resolves to a
  generic :class:`Stub` that just records its constructor args / state,
- rebuilds tensors as **numpy arrays** directly from the zip storage entries
  (``torch._utils._rebuild_tensor_v2`` is reimplemented on numpy),
- exposes module trees as nested stubs so callers can walk
  ``_parameters`` / ``_buffers`` / ``_modules`` into a flat
  ``name -> ndarray`` state dict plus structural metadata (yaml config,
  class names, anchors ...).

This is the TPU build's replacement for the reference's unpickle-the-module
checkpoint loading (SURVEY.md §2.2 "Checkpoint load").
"""

from __future__ import annotations

import io
import pickle
import struct
import zipfile
from typing import Any, Dict, Optional

import numpy as np

try:  # bfloat16 numpy dtype if available (ships with jax)
    import ml_dtypes

    _BFLOAT16 = np.dtype(ml_dtypes.bfloat16)
except Exception:  # pragma: no cover
    _BFLOAT16 = None

_STORAGE_DTYPES = {
    "FloatStorage": np.dtype("<f4"),
    "DoubleStorage": np.dtype("<f8"),
    "HalfStorage": np.dtype("<f2"),
    "LongStorage": np.dtype("<i8"),
    "IntStorage": np.dtype("<i4"),
    "ShortStorage": np.dtype("<i2"),
    "CharStorage": np.dtype("<i1"),
    "ByteStorage": np.dtype("<u1"),
    "BoolStorage": np.dtype("?"),
}
if _BFLOAT16 is not None:
    _STORAGE_DTYPES["BFloat16Storage"] = _BFLOAT16


class Stub:
    """Generic stand-in for any class referenced by the pickle.

    Records positional args (``_stub_args``) and the pickled state
    (``__dict__``) without running any real constructor.
    """

    _stub_name = "?"

    def __init__(self, *args, **kwargs):
        self._stub_args = args
        if kwargs:
            self.__dict__.update(kwargs)

    @classmethod
    def _new(cls, *args):  # for __newobj__ reduce protocol
        obj = cls.__new__(cls)
        obj._stub_args = args
        return obj

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        elif isinstance(state, tuple) and len(state) == 2:
            # (dict_state, slots_state)
            d, s = state
            if d:
                self.__dict__.update(d)
            if s:
                self.__dict__.update(s)
        else:
            self.__dict__["_stub_state"] = state

    def __repr__(self):
        return f"<Stub {self._stub_name}>"


class _LazyStorage:
    """Placeholder for a torch storage living in the checkpoint zip."""

    __slots__ = ("dtype", "key", "numel", "_zf", "_prefix", "_cache")

    def __init__(self, dtype, key, numel, zf, prefix):
        self.dtype = dtype
        self.key = key
        self.numel = numel
        self._zf = zf
        self._prefix = prefix
        self._cache = None

    def data(self) -> np.ndarray:
        if self._cache is None:
            raw = self._zf.read(f"{self._prefix}/data/{self.key}")
            self._cache = np.frombuffer(raw, dtype=self.dtype)
        return self._cache


def _rebuild_tensor_v2(storage, storage_offset, size, stride, *args):
    """numpy reimplementation of torch._utils._rebuild_tensor_v2."""
    if not isinstance(storage, _LazyStorage):
        raise ValueError(f"unexpected storage {type(storage)}")
    flat = storage.data()
    itemsize = flat.dtype.itemsize
    if len(size) == 0:
        return np.asarray(flat[storage_offset]).reshape(())
    arr = np.lib.stride_tricks.as_strided(
        flat[storage_offset:],
        shape=tuple(size),
        strides=tuple(s * itemsize for s in stride),
    )
    return np.ascontiguousarray(arr)


def _rebuild_parameter(data, requires_grad=True, hooks=None):
    return data


def _identity(*args):
    return args[0] if args else None


class _AttrDict(dict):
    """dict that tolerates pickle BUILD state (torch OrderedDicts carry a
    ``_metadata`` attribute)."""

    def __setstate__(self, state):
        if isinstance(state, dict):
            for k, v in state.items():
                object.__setattr__(self, "_attr_" + k, v)


class _RestrictedUnpickler(pickle.Unpickler):
    _ALLOWED = {
        ("collections", "OrderedDict"): _AttrDict,
        ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
        ("torch._utils", "_rebuild_parameter"): _rebuild_parameter,
        ("torch._utils", "_rebuild_tensor"): _rebuild_tensor_v2,
        ("torch.serialization", "_get_layout"): _identity,
        ("numpy.core.multiarray", "scalar"): lambda dt, b: np.frombuffer(b, dt)[0],
        ("numpy.core.multiarray", "_reconstruct"): None,  # handled below
        ("numpy", "dtype"): np.dtype,
        ("numpy", "ndarray"): np.ndarray,
        ("_codecs", "encode"): lambda s, enc: s.encode(enc),
    }

    def __init__(self, file, zf: zipfile.ZipFile, prefix: str):
        super().__init__(file)
        self._zf = zf
        self._prefix = prefix
        self._stub_cache: Dict[str, type] = {}

    def find_class(self, module: str, name: str):
        key = (module, name)
        if key in self._ALLOWED:
            fn = self._ALLOWED[key]
            if fn is not None:
                return fn
            if name == "_reconstruct":

                def _np_reconstruct(subtype, shape, dtype):
                    return np.ndarray.__new__(np.ndarray, shape, dtype)

                return _np_reconstruct
        if module.startswith("torch") and name in _STORAGE_DTYPES:
            return _STORAGE_DTYPES[name]
        # Everything else (torch modules, model classes, ...) -> stub class.
        full = f"{module}.{name}"
        if full not in self._stub_cache:
            self._stub_cache[full] = type(
                f"Stub_{name}", (Stub,), {"_stub_name": full}
            )
        return self._stub_cache[full]

    def persistent_load(self, saved_id):
        # ('storage', storage_dtype, key, location, numel)
        if isinstance(saved_id, tuple) and saved_id and saved_id[0] == "storage":
            _, storage_type, key, _location, numel = saved_id
            dtype = (
                storage_type
                if isinstance(storage_type, np.dtype)
                or (_BFLOAT16 is not None and storage_type is _BFLOAT16)
                else np.dtype("<f4")
            )
            return _LazyStorage(dtype, key, numel, self._zf, self._prefix)
        raise pickle.UnpicklingError(f"unsupported persistent id {saved_id!r}")


def load_checkpoint(path: str) -> Any:
    """Parse a PyTorch zip checkpoint without executing any code.

    Returns the checkpoint object with tensors as numpy arrays and arbitrary
    classes replaced by :class:`Stub` instances.
    """
    zf = zipfile.ZipFile(path)
    names = zf.namelist()
    pkl = next(n for n in names if n.endswith("/data.pkl"))
    prefix = pkl[: -len("/data.pkl")]
    up = _RestrictedUnpickler(io.BytesIO(zf.read(pkl)), zf, prefix)
    return up.load()


def _is_tensor(x) -> bool:
    return isinstance(x, np.ndarray)


def module_state_dict(mod: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    """Walk a stubbed nn.Module tree into a flat ``name -> ndarray`` dict.

    Mirrors torch's ``Module.state_dict()`` naming (parameters then buffers,
    recursing through ``_modules``).  Shared submodules (e.g. the reference
    LPSR's shared CSAR instance, reference ``my_models/lpsr.py:201-205``)
    appear once per path, like torch's state_dict.
    """
    out: Dict[str, np.ndarray] = {}
    params = getattr(mod, "_parameters", None) or {}
    for k, v in params.items():
        if _is_tensor(v):
            out[prefix + k] = v
    bufs = getattr(mod, "_buffers", None) or {}
    for k, v in bufs.items():
        if _is_tensor(v):
            out[prefix + k] = v
    mods = getattr(mod, "_modules", None) or {}
    for k, v in mods.items():
        if v is not None:
            out.update(module_state_dict(v, prefix + k + "."))
    return out


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a checkpoint that is (or contains) a plain state dict.

    Accepts both a raw ``{name: tensor}`` dict and the
    ``{'model_state_dict': ...}`` wrapper the reference trainers emit
    (reference ``inference/run.py:126``).
    """
    obj = load_checkpoint(path)
    if isinstance(obj, dict):
        if "model_state_dict" in obj:
            obj = obj["model_state_dict"]
        if all(_is_tensor(v) for v in obj.values()):
            return dict(obj)
    raise ValueError(f"{path} is not a plain state-dict checkpoint")


class YoloCheckpoint:
    """Structured view of a pickled-YOLOv5-Model checkpoint (e.g. char.pt).

    Exposes the pieces the TPU build needs: the architecture yaml dict, class
    names, per-level anchors/strides from the Detect head, hyperparameters,
    and the flat fp32 state dict — all recovered without running any pickled
    code (reference counterpart: ``yolov5/models/experimental.py:90-99``).
    """

    def __init__(self, path: str, prefer_ema: bool = True):
        ckpt = load_checkpoint(path)
        if not isinstance(ckpt, dict) or "model" not in ckpt:
            raise ValueError(f"{path}: expected a YOLOv5 train checkpoint dict")
        self.raw = ckpt
        model = None
        if prefer_ema and ckpt.get("ema") is not None:
            model = ckpt["ema"]
        if model is None or not hasattr(model, "_modules"):
            model = ckpt["model"]
        self.model = model
        self.yaml: Dict[str, Any] = dict(getattr(model, "yaml", {}) or {})
        self.names = list(getattr(model, "names", []) or [])
        self.hyp: Optional[Dict[str, Any]] = getattr(model, "hyp", None)
        sd = module_state_dict(model)
        self.state_dict = {
            k: (v.astype(np.float32) if v.dtype.kind == "f" else v)
            for k, v in sd.items()
        }
        # Detect head metadata
        self.anchors = None
        self.stride = None
        for k, v in self.state_dict.items():
            if k.endswith(".anchors"):
                self.anchors = np.asarray(v, np.float32)  # (nl, na, 2), grid units
        strides = getattr(model, "stride", None)
        if _is_tensor(strides):
            self.stride = np.asarray(strides, np.float32)

    @property
    def nc(self) -> int:
        return int(self.yaml.get("nc", len(self.names) or 0))
