"""Dense evaluation grids.

Equivalent of reference ``src/NPHM/utils/reconstruction.py:5-20``: an 'ij'
meshgrid over an axis-aligned box, flattened to [res^3, 3] in the order
(x-major, then y, then z) so logits reshape back to [res, res, res].
"""

from __future__ import annotations

import numpy as np


def create_grid_points_from_bounds(minimum, maximum, res: int, scale=None):
    if scale is not None:
        res = int(scale * res)
        minimum = [scale * m for m in minimum]
        maximum = [scale * m for m in maximum]
    axes = [
        np.linspace(minimum[i], maximum[i], res, dtype=np.float32) for i in range(3)
    ]
    X, Y, Z = np.meshgrid(*axes, indexing="ij")
    return np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=-1)
