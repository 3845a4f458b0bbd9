"""Device mesh construction.

The reference has no distributed machinery at all (SURVEY.md §2.3); this
module is new TPU-first infrastructure. Axes:

  * ``data``  — data parallelism over fragment/frame batches
  * ``graph`` — model/graph parallelism: tensor-parallel parameter
    sharding during training, atom-partitioning of one large molecular
    graph during inference (the graph-world sequence-parallel analogue)

Multi-host bootstrap goes through jax.distributed.initialize; within a
slice the collectives ride ICI, across slices DCN (XLA chooses given the
mesh's device order from mesh_utils).
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh


def initialize_distributed(coordinator: Optional[str] = None, **kw) -> None:
    """Multi-host process bootstrap (no-op without a coordinator or when
    already initialized). Must run before any other JAX API touches the
    backend — so no jax.devices()/process_count() probes here.
    Exercised by tests/test_multihost.py (two processes, Gloo CPU
    collectives, DP step matching single-process numerics)."""
    if coordinator is None or jax.distributed.is_initialized():
        return
    jax.distributed.initialize(coordinator_address=coordinator, **kw)


def make_mesh(
    data: Optional[int] = None,
    graph: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, graph) mesh over the available devices.

    With no arguments, puts all devices on the data axis. Axis sizes
    must multiply to the device count used.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None and graph is None:
        data, graph = n, 1
    elif data is None:
        data = n // graph
    elif graph is None:
        graph = n // data
    if data * graph != n:
        devices = devices[: data * graph]
    dev_array = mesh_utils.create_device_mesh(
        (data, graph), devices=np.asarray(devices)
    )
    return Mesh(dev_array, axis_names=("data", "graph"))


def best_factorization(n: int) -> Tuple[int, int]:
    """(data, graph) split: the most even factor pair, data >= graph."""
    best = (n, 1)
    for g in range(1, int(math.isqrt(n)) + 1):
        if n % g == 0:
            best = (n // g, g)
    return best
