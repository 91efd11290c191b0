"""Device-mesh construction for multi-chip scale-out.

The reference is a single-process, single-thread C++ app with no
distributed layer (SURVEY.md §2c); this framework's scale-out follows the
TPU-native recipe instead: a ``jax.sharding.Mesh`` with named axes, sharding
annotations, and XLA collectives over ICI.

Axes:
  * ``data``   — independent work items (frame pairs, replay batches):
                 pure data parallelism, no cross-talk.
  * ``points`` — the long axis of one problem (source points of an ICP
                 solve, NDT source points): sharded sweeps with ``psum``
                 reductions of the fit moments / score (SURVEY.md §5
                 "long-context" mapping).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_devices: Optional[int] = None,
    axes: Sequence[str] = ("data", "points"),
) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices, factoring the
    device count onto the requested axes (data axis gets the smaller
    factor; a single axis takes everything)."""
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    devs = devs[:n]
    if len(axes) == 1:
        return Mesh(np.array(devs), axes)
    # factor n = a * b with a <= b
    a = 1
    for cand in range(int(np.sqrt(n)), 0, -1):
        if n % cand == 0:
            a = cand
            break
    b = n // a
    return Mesh(np.array(devs).reshape(a, b), axes)
