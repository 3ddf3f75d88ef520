"""The block pipeline: explicit state + pure step functions.

The reference's runtime is thread-and-mutex choreography (capture threads,
per-device control threads, a DSP thread, a publisher — SURVEY.md §1). Here
the same behavior is a deterministic dataflow:

  * ``PipelineState`` carries what the reference scatters across
    ``csdrdevice`` atomics/mutexes (lag, phase, sync flags, buffers).
  * ``step()`` is the whole per-block hot path (ccoherent::threadf +
    est_phasecorrect + phasecorrect + the ccontrol update) as one jitted
    function.
  * ``align_offline()`` is the capability the reference cannot express: the
    measure -> smooth -> apply pipeline parallelized over the whole capture
    (EMA as an associative scan).
"""

from coherent_rtlsdr_tpu.pipeline.state import (
    PipelineConfig,
    PipelineState,
    BlockOutput,
    Telemetry,
    init_state,
)
from coherent_rtlsdr_tpu.pipeline.control import control_update
from coherent_rtlsdr_tpu.pipeline.step import make_step, step
from coherent_rtlsdr_tpu.pipeline.offline import align_offline

__all__ = [
    "PipelineConfig",
    "PipelineState",
    "BlockOutput",
    "Telemetry",
    "init_state",
    "control_update",
    "make_step",
    "step",
    "align_offline",
]
