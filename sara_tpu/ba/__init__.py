"""Bundle adjustment: Levenberg-Marquardt + Schur complement, TPU-native."""

from sara_tpu.ba.core import (
    BAProblem, BAOptions, bundle_adjust, bundle_adjust_cg, ba_cost,
    project_obs,
)
from sara_tpu.ba.dense_schur import DenseSchurSession

__all__ = ["BAProblem", "BAOptions", "bundle_adjust", "bundle_adjust_cg",
           "ba_cost", "project_obs", "DenseSchurSession"]
