"""Utilities: metrics, timing, logging."""

from sara_tpu.utils.metrics import umeyama_alignment, ate_rmse
from sara_tpu.utils.timing import Timer, TicToc

__all__ = ["umeyama_alignment", "ate_rmse", "Timer", "TicToc"]
