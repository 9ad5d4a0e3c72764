"""Execution engine: the reference's `IonicModel.run()` session loop
(ionic.py:171-245) rebuilt as compiled `lax.scan` chunks with host-side
event scheduling."""

from fib_tf_tpu.engine.simulation import Simulation, SimResult
from fib_tf_tpu.engine.observers import (
    CycleLengthDetector,
    ElectrogramRecorder,
    fibrillation_density,
)
from fib_tf_tpu.engine.volume import VolumeEvent, run_volume, volume_state

__all__ = [
    "Simulation",
    "SimResult",
    "CycleLengthDetector",
    "ElectrogramRecorder",
    "fibrillation_density",
    "VolumeEvent",
    "run_volume",
    "volume_state",
]
