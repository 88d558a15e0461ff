"""Debug tensor printing (ref: help/src/lib.rs:5-89 ``print_tensor!``).

The reference reads CUDA device pointers to pretty-print tensors; on TPU a
``jax.debug.print``/host fetch does the same without unsafe pointer reads.
"""

from __future__ import annotations

import numpy as np


def print_tensor(name: str, x, max_elems: int = 64) -> None:
    """Print shape/dtype/stats + leading values of any JAX or numpy array."""
    arr = np.asarray(x)
    flat = arr.reshape(-1)
    head = np.array2string(flat[:max_elems], precision=4, separator=", ")
    print(
        f"{name}: shape={arr.shape} dtype={arr.dtype} "
        f"min={flat.min():.4g} max={flat.max():.4g} "
        f"mean={flat.astype(np.float64).mean():.4g}\n  {head}"
        + (" ..." if flat.size > max_elems else "")
    )


def print_tensor_no_data(name: str, x) -> None:
    arr = np.asarray(x)
    print(f"{name}: shape={arr.shape} dtype={arr.dtype}")


def traced_print(name: str, x) -> None:
    """Print from inside jitted code (host callback)."""
    import jax

    jax.debug.print(name + ": {}", x)
