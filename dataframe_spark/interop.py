"""Tensor interop (reference dataframe-hasktorch/src/DataFrame/
Hasktorch.hs ``toTensor`` / ``toIntTensor``).

Torch is an optional dependency: the conversions build on the Arrow
matrix path (constructors.to_float_matrix / to_int_matrix) and hand
the contiguous numpy buffer to ``torch.from_numpy`` — a zero-copy
wrap. Without torch installed the functions raise a clear
ImportError; the numpy-matrix constructors remain the
always-available interop surface.

Actions collect to the driver by design (a tensor is driver-side
state); for model training ON the cluster, use the pandas-UDF
escape hatches (expr.lift) or ml/ instead.
"""

from __future__ import annotations

from typing import Sequence

from .constructors import to_float_matrix, to_int_matrix
from .core import DataFrame


def _require_torch():
    try:
        import torch  # noqa: F401

        return torch
    except ImportError as e:  # pragma: no cover - torch not in test env
        raise ImportError(
            "to_tensor requires the optional 'torch' dependency "
            "(pip install torch); to_float_matrix/to_int_matrix "
            "provide the same data as numpy arrays without it"
        ) from e


def to_tensor(df: DataFrame, cols: Sequence[str] | None = None):
    """Hasktorch.hs:50 ``toTensor`` — float32 tensor of the numeric
    columns; single-column frames yield a 1-D tensor of shape
    [rows], multi-column frames [rows, cols]."""
    torch = _require_torch()
    m = to_float_matrix(df, cols)
    if m.ndim == 2 and m.shape[1] == 1:
        m = m[:, 0]
    return torch.from_numpy(m)


def to_int_tensor(df: DataFrame, cols: Sequence[str] | None = None):
    """Hasktorch.hs:102 ``toIntTensor`` — int64 variant; raises
    TypeMismatchError on null or non-integral values (the reference
    rounds silently for floats but Left-errors on parse failure;
    we inherit to_int_matrix's stricter integral check)."""
    torch = _require_torch()
    m = to_int_matrix(df, cols)
    if m.ndim == 2 and m.shape[1] == 1:
        m = m[:, 0]
    return torch.from_numpy(m)
