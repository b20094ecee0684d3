"""Static-shape padding helpers.

XLA traces once per distinct shape, so all ragged host-side data is padded
to fixed capacities before it reaches a jitted function. These helpers
centralise the rounding policy (multiples of 8 sublanes by default, which
keeps segment/gather ops tiled cleanly on the VPU).
"""

import numpy as np


def round_up(n: int, multiple: int = 8) -> int:
    if n == 0:
        return multiple
    return ((n + multiple - 1) // multiple) * multiple


def pad_to(arr: np.ndarray, size: int, axis: int = 0, fill=0) -> np.ndarray:
    """Pad `arr` with `fill` along `axis` up to length `size`."""
    cur = arr.shape[axis]
    if cur > size:
        raise ValueError(f"array of length {cur} exceeds capacity {size}")
    if cur == size:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, size - cur)
    return np.pad(arr, widths, mode="constant", constant_values=fill)
