from coherent_rtlsdr_tpu.utils.telemetry import TelemetryRecorder, BlockTimer

__all__ = ["TelemetryRecorder", "BlockTimer"]
