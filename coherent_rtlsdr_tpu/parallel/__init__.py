"""Device-mesh parallelism.

The reference's concurrency is POSIX threads on one small ARM board
(SURVEY.md §2.4). Here the parallel axes are a ``(time, channel)`` device
mesh:

  * ``channel``: embarrassingly parallel per-channel DSP; the reference
    channel is replicated to every shard (it is L complex samples — the
    broadcast the reference does implicitly through shared memory).
  * ``time``: blocks of the capture; the only coupling is the overlap-save
    window straddling shard boundaries — one block of halo exchanged with
    ``ppermute`` — and the smoother's tiny ``psum`` reductions.
"""

from coherent_rtlsdr_tpu.parallel.mesh import make_mesh, auto_mesh_shape
from coherent_rtlsdr_tpu.parallel.sharded import (
    make_auto_sharded_align,
    make_channel_sharded_align,
    make_fused_time_sharded_align,
    make_sharded_align,
    make_sharded_step,
)

__all__ = [
    "make_mesh",
    "auto_mesh_shape",
    "make_auto_sharded_align",
    "make_channel_sharded_align",
    "make_fused_time_sharded_align",
    "make_sharded_align",
    "make_sharded_step",
]
