"""Utilities: metrics, timing, logging."""

from sara_tpu.utils.metrics import umeyama_alignment, ate_rmse
from sara_tpu.utils.timing import Timer, TicToc, device_trace
from sara_tpu.utils.roofline import (Estimate, ba_lm_iteration, sift_frame,
                                    report as roofline_report)

__all__ = ["umeyama_alignment", "ate_rmse", "Timer", "TicToc",
           "device_trace", "Estimate", "ba_lm_iteration", "sift_frame",
           "roofline_report"]
