"""pygemma_tpu: a TPU-native linear-mixed-model GWAS engine (GEMMA method).

Built from scratch against the behavioural spec of rlangefe/pygemma (see
SURVEY.md); compute path is JAX/XLA/Pallas, batched over SNPs and sharded
over device meshes.
"""

__version__ = "0.1.0"

from . import compare, io, linreg, plotting, preprocess, sim  # noqa: F401
from .api import estimate_lambda, pygemma
from .config import GwasConfig, from_env
from .core.lowrank import LowRankKinship

__all__ = [
    "pygemma",
    "estimate_lambda",
    "LowRankKinship",
    "GwasConfig",
    "from_env",
    "io",
    "linreg",
    "plotting",
    "preprocess",
    "sim",
    "__version__",
]
