"""Device mesh helpers.

Two logical axes (SURVEY.md section 2a):
  data  -- query-read batches (the reference's pthread split analog)
  dict  -- k-mer-dictionary shards by key range (the TP/EP-analog axis)
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_data: Optional[int] = None, n_dict: int = 1, devices=None) -> Mesh:
    # local_devices, NOT devices: under jax.distributed the orchestrator's
    # parallelism is task-level (each process owns a stripe of pair jobs,
    # orchestrator.py), so every engine meshes over the devices its own
    # process can address.  Single-process, local == global.
    devices = devices if devices is not None else jax.local_devices()
    if n_data is None:
        n_data = len(devices) // n_dict
    assert n_data * n_dict <= len(devices), (
        f"need {n_data}x{n_dict} devices, have {len(devices)}"
    )
    dev = np.asarray(devices[: n_data * n_dict]).reshape(n_data, n_dict)
    return Mesh(dev, axis_names=("data", "dict"))
