"""The ionic model zoo (reference SURVEY.md §2 components 2-7)."""

from fib_tf_tpu.models.base import IonicModel, Geometry, grid_geometry, cell_geometry
from fib_tf_tpu.models.fenton import Fenton4v
from fib_tf_tpu.models.beeler_reuter import BeelerReuter
from fib_tf_tpu.models.courtemanche import Courtemanche, CourtemancheUltra
from fib_tf_tpu.models.mitchell_schaeffer import MitchellSchaeffer
from fib_tf_tpu.models.luo_rudy import LuoRudy91
from fib_tf_tpu.models.tp06 import TenTusscher06

MODEL_REGISTRY = {
    "fenton": Fenton4v,
    "br": BeelerReuter,
    "beeler_reuter": BeelerReuter,
    "court": Courtemanche,
    "courtemanche": Courtemanche,
    "court_ultra": CourtemancheUltra,
    "ms": MitchellSchaeffer,
    "mitchell_schaeffer": MitchellSchaeffer,
    "lr1": LuoRudy91,
    "luo_rudy": LuoRudy91,
    "tp06": TenTusscher06,
    "tentusscher": TenTusscher06,
}

__all__ = [
    "IonicModel",
    "Geometry",
    "grid_geometry",
    "cell_geometry",
    "Fenton4v",
    "BeelerReuter",
    "Courtemanche",
    "CourtemancheUltra",
    "MitchellSchaeffer",
    "LuoRudy91",
    "TenTusscher06",
    "MODEL_REGISTRY",
]
