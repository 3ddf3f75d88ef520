"""Mesh construction helpers."""

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

TIME_AXIS = "time"
CHANNEL_AXIS = "channel"


def auto_mesh_shape(n_devices: int, n_channels: Optional[int] = None) -> Tuple[int, int]:
    """Choose a (time, channel) factorization of ``n_devices``.

    Prefer the largest channel-axis factor that divides both the device count
    and (if given) the channel count — channel parallelism is collective-free,
    so it should soak up as many devices as the channel count supports; the
    rest go to the time axis.
    """
    best_c = 1
    for c in range(1, n_devices + 1):
        if n_devices % c:
            continue
        if n_channels is not None and n_channels % c:
            continue
        best_c = c
    return n_devices // best_c, best_c


def make_mesh(
    time: int,
    channel: int,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devs = np.asarray(devices if devices is not None else jax.devices())
    if devs.size < time * channel:
        raise ValueError(
            f"mesh {time}x{channel} needs {time * channel} devices, have {devs.size}"
        )
    return Mesh(devs[: time * channel].reshape(time, channel), (TIME_AXIS, CHANNEL_AXIS))
